"""SDF mapping: the jitted continual-training step for the neural SDF.

Reference: Mapper.sdf_mapping (utils/mapper.py:792-991) — per iteration:
sample a batch from the replay pool, query neural-point features, decode
SDF (+ color/semantics), compute BCE + eikonal (+ color) losses, AdamW step
over [neural-point features, decoder MLPs], write features back.

TPU re-design: one fused jitted ``sdf_step`` whose trainable pytree is
{geo_feat, color_feat, sdf-MLP, color-MLP}. Feature gradients flow into the
*global* capacity-padded arrays (dense optax update; only queried rows get
nonzero grad). Optimizer = optax multi_transform mirroring the reference's
per-param-group AdamW (utils/tools.py:142-365): features at ``lr``, MLPs at
``lr_mlp_base``, eps=adam_eps.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from pings_tpu.mapping import losses
from pings_tpu.models import field
from pings_tpu.models import neural_points as npm


def row_masked_adamw(lr: float, eps: float,
                     weight_decay: float) -> optax.GradientTransformation:
    """AdamW whose decoupled weight decay touches only rows with nonzero
    gradient this step.

    The neural-point feature arrays are dense capacity-padded buffers
    ((cap+1, F)); each training step's gradient is nonzero only for the
    queried rows. Plain adamw would decay *every* map feature every
    iteration — silently eroding geometry far from the sensor. Rows with
    zero gradient also have zero Adam moments, so with masked decay they
    are bit-stable across steps (regression-tested)."""
    adam = optax.adam(lr, eps=eps)

    def init(params):
        return adam.init(params)

    def update(grads, state, params=None):
        updates, state = adam.update(grads, state, params)
        if weight_decay > 0:
            updates = jax.tree.map(
                lambda u, g, p: u - lr * weight_decay * p * jnp.any(
                    g != 0, axis=-1, keepdims=True),
                updates, grads, params)
        return updates, state

    return optax.GradientTransformation(init, update)


def make_sdf_optimizer(cfg) -> optax.GradientTransformation:
    def adamw(lr):
        return optax.adamw(lr, eps=cfg.adam_eps,
                           weight_decay=cfg.weight_decay)

    labels = {"geo_feat": "feat", "color_feat": "feat",
              "sdf": "mlp", "color": "mlp"}
    if cfg.semantic_on:
        labels["sem"] = "mlp"
    return optax.multi_transform(
        {"feat": row_masked_adamw(cfg.lr, cfg.adam_eps, cfg.weight_decay),
         "mlp": adamw(cfg.lr_mlp_base)},
        param_labels=labels,
    )


def sdf_params(m: npm.NeuralPointMap, decoders,
               semantic_on: bool = False) -> Dict:
    p = {
        "geo_feat": m.geo_feat,
        "color_feat": m.color_feat,
        "sdf": decoders["sdf"],
        "color": decoders["color"],
    }
    if semantic_on:
        p["sem"] = decoders["sem"]
    return p


def apply_sdf_params(m, decoders, params) -> Tuple[npm.NeuralPointMap, Dict]:
    m = m.replace(geo_feat=params["geo_feat"],
                  color_feat=params["color_feat"])
    decoders = {**decoders, "sdf": params["sdf"], "color": params["color"]}
    if "sem" in params:
        decoders["sem"] = params["sem"]
    return m, decoders


class SdfStepMetrics(NamedTuple):
    total: jnp.ndarray
    bce: jnp.ndarray
    eikonal: jnp.ndarray
    color: jnp.ndarray
    sem: jnp.ndarray
    nonfinite: jnp.ndarray = False


def guard_nonfinite(grads):
    """Zero the whole gradient pytree if ANY entry is non-finite.

    One bad iteration (inf/NaN from a degenerate batch) would otherwise
    poison the map and decoders permanently — the reference survives by
    luck of torch semantics; here the step is explicitly skipped and the
    event surfaced in metrics (SURVEY §5 failure-detection parity)."""
    finite = jnp.all(jnp.stack(
        [jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(grads)]))
    grads = jax.tree.map(
        lambda x: jnp.where(finite, x, jnp.zeros_like(x)), grads)
    return grads, ~finite


def _make_sdf_step_body(cfg, optimizer):
    """The un-jitted single-iteration body shared by make_sdf_step (one
    dispatch per iteration) and make_sdf_scan_step (all of a frame's
    iterations in ONE dispatch — on a tunneled TPU the per-dispatch
    latency dominates the mapping loop, see scripts/profile_training.py)."""
    k = cfg.query_nn_k
    stencil_r = cfg.num_nei_cells
    alpha = cfg.search_alpha
    sigma_scale = cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m
    sigma = cfg.sigma_sigmoid_m
    eik_n = max(cfg.bs // max(cfg.gradient_decimation, 1), 8)
    grad_delta = cfg.voxel_size_m * cfg.num_grad_step_ratio
    color_on = cfg.color_on
    sem_on = cfg.semantic_on
    # "field"-source incidence only: the r5 default ("scan") applies
    # field-independent weights at sampling time (ops/scan_normals.py +
    # sampler), so the per-step FD-gradient reweighting here stays off
    incidence_on = (cfg.incidence_weight_on
                    and cfg.incidence_source == "field")
    incidence_floor = cfg.incidence_weight_floor
    weight_e = cfg.weight_e
    weight_c = cfg.weight_c
    weight_s = cfg.weight_s

    def step(params, opt_state, batch, static_map, decoders, freeze):
        pts, sdf_label, color_label, weight, valid = batch[:5]
        sem_label = batch[5] if len(batch) > 5 else None
        ray = batch[6] if len(batch) > 6 else None

        # ONE neighbor search for the whole iteration, hoisted out of the
        # loss closure: neighbor selection depends only on non-trainable
        # map state (positions/hash/valid), so the (N, S) stencil gathers
        # run once per step, outside autodiff; the SDF value, its FD
        # eikonal probes, the color decode and the semantic decode all
        # share the table (VERDICT r3 item 2)
        kidx = npm.query_neighbor_idx(static_map, pts, k, stencil_r, alpha)

        def loss_fn(p):
            m, d = apply_sdf_params(static_map, decoders, p)
            q = npm.eval_neighbors(m, pts, kidx, stencil_r, alpha)
            sdf, _, qvalid = field.sdf_from_query(d, q, sigma_scale)
            v = (valid & qvalid).astype(jnp.float32)
            w_b = weight
            if incidence_on and ray is not None:
                # full-batch FD gradient (shared neighbor table) both
                # feeds the incidence weights and covers the eikonal
                g_all = field.sdf_grad_numerical_nn(
                    m, d, pts, kidx, sigma_scale, grad_delta, stencil_r,
                    alpha)
                w_b = w_b * jax.lax.stop_gradient(losses.incidence_weights(
                    g_all, ray, incidence_floor))
                g = g_all[:eik_n]
            else:
                # eikonal on the first eik_n points (batch is already
                # shuffled); numerical central differences (reference
                # numerical_grad path, mapper.py:918-939) sharing the
                # center neighbor table
                g = field.sdf_grad_numerical_nn(m, d, pts[:eik_n],
                                                kidx[:eik_n], sigma_scale,
                                                grad_delta, stencil_r,
                                                alpha)
            bce = losses.sdf_bce_loss(sdf, sdf_label, w_b, sigma, v)
            eik = losses.eikonal_loss(g, v[:eik_n])

            if color_on:
                cpred, cvalid = field.color_from_query(d, q)
                cmask = v * cvalid * (jnp.abs(sdf_label) < 2.0 * sigma)
                closs = losses.color_l1_loss(cpred, color_label, cmask)
            else:
                closs = jnp.float32(0.0)

            if sem_on and sem_label is not None:
                # NLL on labeled near-surface samples (reference
                # sdf_mapping's sem loss, utils/mapper.py:906-916: loss_nll
                # over surface samples with weight_s)
                from pings_tpu.models import decoder as dec
                logits = dec.mlp_forward(d["sem"], q.feat)
                blended = jnp.sum(logits * q.weights[..., None], axis=-2)
                log_prob = jax.nn.log_softmax(blended, axis=-1)
                smask = v * q.valid * (sem_label >= 0) * (
                    jnp.abs(sdf_label) < 2.0 * sigma)
                sloss = losses.sem_nll_loss(
                    log_prob, jnp.maximum(sem_label, 0), smask)
            else:
                sloss = jnp.float32(0.0)

            total = bce + weight_e * eik + weight_c * closs + weight_s * sloss
            return total, SdfStepMetrics(total, bce, eik, closs, sloss)

        grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
        zero_mlp = lambda g: jax.tree.map(
            lambda x: jnp.where(freeze, jnp.zeros_like(x), x), g)
        grads = {**grads, **{name: zero_mlp(grads[name]) for name in
                             ("sdf", "color", "sem") if name in grads}}
        grads, nonfinite = guard_nonfinite(grads)
        metrics = metrics._replace(nonfinite=nonfinite)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def make_sdf_step(cfg, optimizer: optax.GradientTransformation):
    """Build the jitted SDF training step.

    step(params, opt_state, batch, static_map, decoders, freeze) ->
        (params, opt_state, metrics)

    ``static_map`` supplies non-trainable map state (positions/hash/masks);
    trainable features live in ``params``. ``freeze`` (traced bool) zeroes
    decoder grads after cfg.freeze_after_frame (reference freeze_decoders,
    mapper.py:470-476)."""
    body = _make_sdf_step_body(cfg, optimizer)
    return jax.jit(body, donate_argnums=(0, 1))


def make_sdf_scan_step(cfg, optimizer: optax.GradientTransformation):
    """All of a frame's SDF iterations in ONE dispatch.

    step(params, opt_state, pool, key, static_map, decoders, freeze,
         iters=N) -> (params, opt_state, stacked_metrics)

    Batches are drawn from the replay pool *inside* the loop (the pool is
    device state), so a frame's whole ``mapping_iters`` loop — previously
    ~3 dispatches per iteration over the TPU tunnel — costs one dispatch.
    ``iters`` is a TRACED dynamic bound (lax.fori_loop): the adaptive
    iteration scheme and the frame-0 init burst all share ONE compiled
    program — r4's time tables showed each distinct static count
    triggering a fresh multi-minute compile mid-run (VERDICT r4 item 5).
    Metrics are the LAST iteration's (leading axis 1 for caller compat)."""
    from pings_tpu.mapping import pool as rp

    body = _make_sdf_step_body(cfg, optimizer)
    bs = cfg.bs
    bs_new = min(cfg.bs_new_sample, cfg.bs // 2)

    # no donate_argnums: params share buffers with static_map (the
    # feature arrays), and the while-loop lowering of the dynamic bound
    # makes XLA flag the donated-and-also-passed buffer (runtime
    # INVALID_ARGUMENT). The transient copy is ~2x the feature arrays —
    # small against HBM.
    @jax.jit
    def scan_step(params, opt_state, pool, key, static_map, decoders,
                  freeze, iters):
        def loop_body(i, carry):
            p, s, _ = carry
            k = jax.random.fold_in(key, i)
            batch = rp.pool_batch(pool, k, bs, bs_new)
            p, s, met = body(p, s, batch, static_map, decoders, freeze)
            return (p, s, met)

        # a zero-metric placeholder with the same structure as one step
        met0 = jax.eval_shape(
            lambda p, s: body(p, s, rp.pool_batch(pool, key, bs, bs_new),
                              static_map, decoders, freeze)[2],
            params, opt_state)
        met0 = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), met0)
        params, opt_state, met = jax.lax.fori_loop(
            0, jnp.asarray(iters, jnp.int32), loop_body,
            (params, opt_state, met0))
        mets = jax.tree.map(lambda x: jnp.asarray(x)[None], met)
        return params, opt_state, mets

    return scan_step


def init_sdf_train(m: npm.NeuralPointMap, decoders, cfg):
    opt = make_sdf_optimizer(cfg)
    params = sdf_params(m, decoders, cfg.semantic_on)
    return opt, params, opt.init(params)
