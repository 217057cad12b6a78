"""Joint Gaussian-splatting + SDF mapping step.

Reference: Mapper.joint_gsdf_mapping (utils/mapper.py:995-1634). Per
iteration: pick a keyframe camera from the pool -> render -> photometric
(L1 + SSIM), depth, normal–D2N consistency, sky, opacity-entropy,
isotropic losses -> Gaussian–SDF consistency (visible high-alpha Gaussians
must sit on the SDF zero level set with gradients parallel to their
normals, and Gaussians stranded in |SDF|-large regions get their alpha
suppressed, mapper.py:1379-1481) -> a concurrent SDF batch (BCE + eikonal
+ color, :1493-1544) -> one backward pass -> AdamW param groups
(features / gaussian MLPs / geo MLPs / exposure / camera deltas,
utils/tools.py:142-365) -> camera pose delta retraction (:1581-1590).

TPU re-design: a single fused jitted step; the camera is chosen host-side
(pool logic stays in mapping/campool.py), all losses share one backward.
Trainables: global feature arrays (+ MLPs + per-keyframe exposure and pose
deltas) — gradients reach features through the local-index gather.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pings_tpu.mapping import losses
from pings_tpu.mapping.sdf_mapper import apply_sdf_params
from pings_tpu.models import field
from pings_tpu.models import neural_points as npm
from pings_tpu.models.renderer import (
    CamView, ExposureParams, apply_exposure, depth_to_normal, render,
)
from pings_tpu.models.spawn import spawn_kwargs_from_cfg, LocalPointData, spawn_gaussians
from pings_tpu.ops import rasterize as rz
from pings_tpu.ops.ssim import dssim_loss


class GsStepMetrics(NamedTuple):
    total: jnp.ndarray
    rgb_l1: jnp.ndarray
    ssim: jnp.ndarray
    depth_l1: jnp.ndarray
    normal: jnp.ndarray
    opacity_ent: jnp.ndarray
    sky: jnp.ndarray
    gs_sdf: jnp.ndarray
    sdf_bce: jnp.ndarray
    psnr: jnp.ndarray
    n_overflow: jnp.ndarray
    nonfinite: jnp.ndarray = False
    # max |Δmeans2d| px since the reused tile table was built (0 when
    # binning ran fresh this step) — drives the host rebin guard
    bin_drift: jnp.ndarray = 0.0


def gs_param_labels() -> Dict[str, str]:
    return {
        "geo_feat": "feat", "color_feat": "feat",
        "sdf": "geo_mlp", "color": "geo_mlp",
        "gauss_xyz": "gs_mlp", "gauss_rot": "gs_mlp",
        "gauss_scale": "gs_mlp", "gauss_alpha": "gs_mlp",
        "gauss_color": "gs_mlp",
        "exposure": "exposure",
        "cam_delta": "cam_delta",
    }


def make_gs_optimizer(cfg) -> optax.GradientTransformation:
    from pings_tpu.mapping.sdf_mapper import row_masked_adamw

    def adamw(lr):
        return optax.adamw(lr, eps=cfg.adam_eps, weight_decay=cfg.weight_decay)

    return optax.multi_transform(
        {
            "feat": row_masked_adamw(cfg.lr, cfg.adam_eps,
                                     cfg.weight_decay),
            "geo_mlp": adamw(cfg.lr_mlp_base),
            "gs_mlp": adamw(cfg.lr_mlp_base),
            "exposure": adamw(cfg.lr_exposure),
            "cam_delta": adamw(cfg.lr_cam_dt),
        },
        param_labels=gs_param_labels(),
    )


def gs_params(m: npm.NeuralPointMap, decoders, exposure_pool,
              cam_delta_pool) -> Dict:
    p = {
        "geo_feat": m.geo_feat, "color_feat": m.color_feat,
        "sdf": decoders["sdf"], "color": decoders["color"],
        "gauss_xyz": decoders["gauss_xyz"],
        "gauss_rot": decoders["gauss_rot"],
        "gauss_scale": decoders["gauss_scale"],
        "gauss_alpha": decoders["gauss_alpha"],
        "gauss_color": decoders["gauss_color"],
        "exposure": exposure_pool,
        "cam_delta": cam_delta_pool,
    }
    return p


def apply_gs_params(m, decoders, params):
    m = m.replace(geo_feat=params["geo_feat"],
                  color_feat=params["color_feat"])
    d = dict(decoders)
    for k in ("sdf", "color", "gauss_xyz", "gauss_rot", "gauss_scale",
              "gauss_alpha", "gauss_color"):
        d[k] = params[k]
    return m, d


def reset_keyframe_slot(params: Dict, opt_state, slot: int):
    """Reset a recycled keyframe slot's per-camera trainables.

    When the camera pool wraps, ``CamPool.add_keyframe`` hands out a slot
    that may have been trained by its previous occupant; without this, the
    new keyframe inherits that keyframe's exposure and pose delta (and
    their Adam moments) — a silent pose/color corruption on long
    sequences (reference resets per-camera params on pool eviction,
    mapper.py:640-686). Returns (params, opt_state) with the slot's
    exposure set to identity, cam_delta to zero, and the corresponding
    optimizer moment rows zeroed."""
    e = params["exposure"]
    n = e.a.shape[0]
    params = dict(params)
    params["exposure"] = ExposureParams(
        mat=e.mat.at[slot].set(jnp.eye(3)),
        off=e.off.at[slot].set(0.0),
        a=e.a.at[slot].set(0.0),
        b=e.b.at[slot].set(0.0))
    params["cam_delta"] = params["cam_delta"].at[slot].set(0.0)
    if opt_state is None:
        return params, None

    def zero_row(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n:
            return x.at[slot].set(jnp.zeros((), x.dtype))
        return x

    inner = dict(opt_state.inner_states)
    for label in ("exposure", "cam_delta"):
        # within the label's masked subtree the only array leaves are that
        # label's mu/nu (others are MaskedNode), so the leading-dim match
        # cannot touch foreign params
        inner[label] = jax.tree.map(zero_row, inner[label])
    return params, opt_state._replace(inner_states=inner)


def make_cam_loss(cfg, width: int, height: int):
    """Factory for the PER-CAMERA part of the joint GS+SDF loss —
    everything except the concurrent SDF replay batch: render, photometric
    (L1 + SSIM), depth, normal-D2N consistency, prior normal, normal
    smoothness, opacity entropy, sky, GS-SDF consistency (value + normal
    alignment), isotropic/area/distortion regularizers.

    SHARED between the single-camera training step (make_gsdf_step) and
    the data-parallel step (parallel/mesh.make_dp_train_step) so the
    multi-chip path trains the *same* objective as the flagship loop
    (VERDICT r3 item 5).

    Returns cam_loss(p, m, d, local_idx, cam, cam_slot, ...) ->
        (cam_total, aux_terms dict, (bins_out, means2d, contrib))."""
    spawn_kwargs = spawn_kwargs_from_cfg(cfg)
    sigma_scale = cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m
    k = cfg.query_nn_k
    stencil_r = cfg.num_nei_cells
    alpha_s = cfg.search_alpha
    bg = jnp.asarray(cfg.bg_color, jnp.float32)
    S = cfg.gs_sdf_sample_count
    grad_delta = cfg.voxel_size_m * cfg.num_grad_step_ratio

    def cam_loss(p, m, d, local_idx, cam, cam_slot, surrounding=None,
                 depth_w=1.0, train_pose=False, bins=None, bin_means=None,
                 cached_contrib=None, use_bins=False):
        local = LocalPointData(
            positions=m.positions[local_idx],
            quats=m.quats[local_idx],
            geo_feat=m.geo_feat[local_idx],
            color_feat=m.color_feat[local_idx],
            rgb=m.rgb[local_idx],
            valid=(local_idx < m.capacity) & m.valid_gs_mask[local_idx],
        )
        exposure = jax.tree.map(lambda x: x[cam_slot], p["exposure"]) \
            if cfg.exposure_correction_on else None
        delta = p["cam_delta"][cam_slot]
        theta, rho = delta[:3], delta[3:]
        if not train_pose:
            theta = jax.lax.stop_gradient(theta)
            rho = jax.lax.stop_gradient(rho)

        # tile-table reuse: bins from a previous iteration on this
        # keyframe are reused (binning is non-diff structure either
        # way); bin_drift = max projected-center movement since the
        # table was built feeds the host rebin guard
        res, bins_out, means2d = render(
            local, d, cam, width, height,
            exposure=exposure,
            affine_exposure=cfg.affine_exposure_correction,
            theta=theta, rho=rho, bg=bg,
            surrounding=surrounding,
            spawn_kwargs=spawn_kwargs,
            tile=cfg.tile_size, max_per_tile=cfg.max_gs_per_tile,
            chunk=32, gs_type=cfg.gs_type,
            precision=cfg.raster_precision,
            # contributions are refreshed on the rebin iterations and
            # reused in between (they drive a sample-selection gate,
            # so bounded staleness is harmless; recomputing every
            # iteration costs an extra per-gaussian scatter pass)
            with_contrib=not use_bins,
            raster_bins=bins if use_bins else None,
            return_bins=True,
            bin_means=bin_means if use_bins else None,
            rebin_drift_px=cfg.raster_rebin_drift_px
            if use_bins else 0.0,
        )
        contrib = (cached_contrib if use_bins
                   and cached_contrib is not None else res.contrib)

        # photometric (mapper.py:1240-1246)
        l1 = losses.l1_masked(res.rgb, cam.rgb)
        ds = dssim_loss(res.rgb, cam.rgb)
        photo = (1.0 - cfg.lambda_ssim) * l1 + cfg.lambda_ssim * ds

        # depth (mapper.py:1252-1268)
        dmask = (cam.depth > 1e-4) & (res.alpha > 0.5)
        dl1 = losses.l1_masked(res.depth, cam.depth, dmask)

        # normal–D2N consistency (mapper.py:1279-1295)
        d2n, d2n_valid = depth_to_normal(res.depth, cam.K)
        nmask = d2n_valid & (res.alpha > 0.5)
        ncons = losses.normal_consistency_loss(res.normal, d2n, nmask)

        # prior-normal supervision (reference mono_normal loss,
        # mapper.py:1302-1309, fed by Metric3D's normal head): here the
        # prior normal is derived from the camera's prior depth map
        # (mono-aligned dense depth or LiDAR splat; sparse maps simply
        # mask out) via the same D2N operator
        if cfg.lambda_mono_normal > 0:
            pn, pn_valid = depth_to_normal(cam.depth, cam.K)
            mn_mask = pn_valid & (cam.depth > 1e-4) & (res.alpha > 0.5)
            mono_n = losses.normal_consistency_loss(
                res.normal, pn, mn_mask)
        else:
            mono_n = jnp.float32(0.0)

        # edge-aware normal smoothness (mapper.py:1299-1305)
        if cfg.lambda_normal_smooth > 0:
            nsm = losses.normal_smooth_loss(
                res.normal, res.depth, res.alpha > 0.5,
                depth_jump_thre_m=cfg.vox_down_m)
        else:
            nsm = jnp.float32(0.0)

        # opacity entropy + sky (mapper.py:1297-1351)
        oent = losses.opacity_entropy_loss(res.alpha)
        sky_l = jax.lax.cond(
            jnp.any(cam.sky > 0),
            lambda: losses.sky_bce_loss(res.alpha, cam.sky),
            lambda: jnp.float32(0.0),
        ) if cfg.sky_on else jnp.float32(0.0)

        # Gaussian–SDF consistency (mapper.py:1379-1481): constrain
        # visible spawned gaussians that actually matter for the
        # render — alpha > min_alpha AND blend contribution above the
        # threshold (reference constraint_mask, mapper.py:1355-1366)
        # — taking the S highest-contribution ones (static-shape
        # stand-in for the reference's random subsample); centers
        # should sit on the zero level set and SDF gradients align
        # with their normals
        g = res.gaussians
        qualify = (g.valid & (g.alphas > cfg.gs_min_alpha)
                   & (contrib > cfg.gs_contribution_threshold))
        score = jnp.where(qualify, contrib, -1.0)
        top_idx = jax.lax.top_k(score, S)[1]
        gsel_mask = score[top_idx] > 0.0
        centers = jax.lax.stop_gradient(g.means[top_idx])
        # one neighbor search shared by the SDF value and its 6 FD
        # normal probes (the search has no gradient path: centers are
        # stop_gradient'ed and neighbor selection is piecewise const)
        kidx_c = npm.query_neighbor_idx(m, centers, k, stencil_r,
                                        alpha_s)
        q_c = npm.eval_neighbors(m, centers, kidx_c, stencil_r, alpha_s)
        sdf_c, _, v_c = field.sdf_from_query(d, q_c, sigma_scale)
        v_cf = (gsel_mask & v_c).astype(jnp.float32)
        gs_sdf = jnp.sum(jnp.abs(sdf_c) * v_cf) / jnp.maximum(
            jnp.sum(v_cf), 1.0)
        # normal alignment
        gq = rz.quat_to_rotmat(g.quats[top_idx])
        gnormal = gq[:, :, 2]
        sgrad = field.sdf_grad_numerical_nn(m, d, centers, kidx_c,
                                            sigma_scale, grad_delta,
                                            stencil_r, alpha_s)
        sgrad_n = sgrad / jnp.sqrt(
            jnp.sum(sgrad * sgrad, axis=-1, keepdims=True) + 1e-12)
        align = 1.0 - jnp.abs(jnp.sum(gnormal * sgrad_n, axis=-1))
        gs_nrm = jnp.sum(align * v_cf) / jnp.maximum(jnp.sum(v_cf), 1.0)

        scale_dims = 3 if cfg.gs_type == "3d_gs" else 2
        iso = losses.isotropic_loss(
            g.scales, g.valid.astype(jnp.float32), n_dims=scale_dims) \
            if cfg.lambda_isotropic > 0 else jnp.float32(0.0)
        area = losses.area_loss(
            g.scales, g.valid.astype(jnp.float32), cfg.voxel_size_m,
            n_dims=scale_dims) \
            if cfg.lambda_area > 0 else jnp.float32(0.0)
        # 2DGS depth distortion (reference rend_dist,
        # mapper.py:1325-1326): mean over non-sky pixels
        if cfg.lambda_distortion > 0 and res.distortion is not None:
            nonsky = 1.0 - cam.sky
            distort = jnp.sum(res.distortion * nonsky) / jnp.maximum(
                jnp.sum(nonsky), 1.0)
        else:
            distort = jnp.float32(0.0)

        cam_total = (
            photo
            + depth_w * cfg.lambda_depth * dl1
            + cfg.lambda_normal_depth_consist * ncons
            + cfg.lambda_mono_normal * mono_n
            + cfg.lambda_normal_smooth * nsm
            + cfg.lambda_opacity_ent * oent
            + cfg.lambda_sky * sky_l
            + cfg.lambda_gs_sdf_consist * gs_sdf
            + cfg.lambda_gs_sdf_normal_consist * gs_nrm
            + cfg.lambda_isotropic * iso
            + cfg.lambda_area * area
            + cfg.lambda_distortion * distort
        )
        aux = dict(l1=l1, ds=ds, dl1=dl1, ncons=ncons, oent=oent,
                   sky_l=sky_l, gs_sdf=gs_sdf,
                   psnr=losses.psnr(res.rgb, cam.rgb),
                   n_overflow=res.n_overflow)
        return cam_total, aux, (bins_out, means2d, res.contrib)

    return cam_loss


def make_sdf_batch_terms(cfg):
    """Factory for the concurrent SDF replay-batch terms (BCE + eikonal,
    mapper.py:1493-1544) — the other shared half of the joint loss.

    Returns batch_terms(m, d, sdf_batch, kidx_b) -> (bce, eik)."""
    sigma_scale = cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m
    sigma = cfg.sigma_sigmoid_m
    stencil_r = cfg.num_nei_cells
    alpha_s = cfg.search_alpha
    grad_delta = cfg.voxel_size_m * cfg.num_grad_step_ratio
    eik_n = max(cfg.bs // max(cfg.gradient_decimation, 1), 8)

    incidence_on = cfg.incidence_weight_on
    incidence_floor = cfg.incidence_weight_floor

    def batch_terms(m, d, sdf_batch, kidx_b):
        pts_b, sdf_lab, col_lab, w_b, valid_b = sdf_batch[:5]
        ray = sdf_batch[6] if len(sdf_batch) > 6 else None
        q_b = npm.eval_neighbors(m, pts_b, kidx_b, stencil_r, alpha_s)
        sdf_p, _, qv = field.sdf_from_query(d, q_b, sigma_scale)
        vb = (valid_b & qv).astype(jnp.float32)
        if incidence_on and ray is not None:
            g_all = field.sdf_grad_numerical_nn(
                m, d, pts_b, kidx_b, sigma_scale, grad_delta, stencil_r,
                alpha_s)
            w_b = w_b * jax.lax.stop_gradient(losses.incidence_weights(
                g_all, ray, incidence_floor))
            gb = g_all[:eik_n]
        else:
            gb = field.sdf_grad_numerical_nn(m, d, pts_b[:eik_n],
                                             kidx_b[:eik_n], sigma_scale,
                                             grad_delta, stencil_r,
                                             alpha_s)
        bce = losses.sdf_bce_loss(sdf_p, sdf_lab, w_b, sigma, vb)
        eik = losses.eikonal_loss(gb, vb[:eik_n])
        return bce, eik

    return batch_terms


def metrics_from_terms(total, aux, bce) -> GsStepMetrics:
    """Assemble GsStepMetrics from the shared loss terms."""
    return GsStepMetrics(
        total=total, rgb_l1=aux["l1"], ssim=1.0 - 2.0 * aux["ds"],
        depth_l1=aux["dl1"], normal=aux["ncons"],
        opacity_ent=aux["oent"], sky=aux["sky_l"],
        gs_sdf=aux["gs_sdf"], sdf_bce=bce, psnr=aux["psnr"],
        n_overflow=aux["n_overflow"], bin_drift=jnp.float32(0.0))


def make_gsdf_step(cfg, optimizer, width: int, height: int,
                   local_size: int):
    """Build the fused GS+SDF training step.

    step(params, opt_state, static_map, decoders, local_idx, cam,
         cam_slot, sdf_batch, freeze_geo) -> (params, opt_state, metrics)
    """
    cam_loss = make_cam_loss(cfg, width, height)
    batch_terms = make_sdf_batch_terms(cfg)
    k = cfg.query_nn_k
    stencil_r = cfg.num_nei_cells
    alpha_s = cfg.search_alpha
    bs_new = min(cfg.bs_new_sample, cfg.bs // 2)

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames=("train_pose", "use_bins",
                                        "draw_batch"))
    def step(params, opt_state, static_map, decoders, local_idx, cam,
             cam_slot, sdf_batch, freeze_geo, surrounding=None,
             depth_w=1.0, train_pose=False, bins=None, bin_means=None,
             cached_contrib=None, use_bins=False, draw_batch=False):

        if draw_batch:
            # sdf_batch is (pool, key): draw the concurrent SDF batch
            # INSIDE the step — one dispatch per GS iteration instead of
            # three over the TPU tunnel (pool state lives on device)
            from pings_tpu.mapping import pool as rp
            pool, bkey = sdf_batch
            sdf_batch = rp.pool_batch(pool, bkey, cfg.bs, bs_new)

        # the concurrent SDF batch's neighbor search depends only on
        # non-trainable map state — run it once, outside autodiff
        kidx_b = npm.query_neighbor_idx(static_map, sdf_batch[0], k,
                                        stencil_r, alpha_s)

        def loss_fn(p):
            m, d = apply_gs_params(static_map, decoders, p)
            cam_total, aux, extras = cam_loss(
                p, m, d, local_idx, cam, cam_slot,
                surrounding=surrounding, depth_w=depth_w,
                train_pose=train_pose, bins=bins, bin_means=bin_means,
                cached_contrib=cached_contrib, use_bins=use_bins)
            bce, eik = batch_terms(m, d, sdf_batch, kidx_b)
            total = cam_total + bce + cfg.weight_e * eik
            return total, (metrics_from_terms(total, aux, bce), *extras)

        grads, (metrics, bins_out, means2d, contrib_out) = jax.grad(
            loss_fn, has_aux=True)(params)
        freeze_keys = ("sdf", "color")
        grads = {
            **grads,
            **{kk: jax.tree.map(
                lambda x: jnp.where(freeze_geo, jnp.zeros_like(x), x),
                grads[kk]) for kk in freeze_keys},
        }
        from pings_tpu.mapping.sdf_mapper import guard_nonfinite
        grads, nonfinite = guard_nonfinite(grads)
        metrics = metrics._replace(nonfinite=nonfinite)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics, (bins_out, means2d, contrib_out)

    return step
