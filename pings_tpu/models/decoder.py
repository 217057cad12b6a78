"""Decoder MLPs as plain JAX pytrees.

TPU-native counterpart of the reference Decoder (model/decoder.py:15-135):
a globally-shared MLP stack ``Linear(in->h) ReLU ... Linear(h, out_dim*out_k)``
with no output activation, plus typed heads:

- ``sdf``: raw output scaled by ``logistic_gaussian_ratio * sigma_sigmoid_m``
  (model/decoder.py:102-104)
- ``regress_color``: sigmoid (model/decoder.py:133-135)
- ``sem_label_prob``: log-softmax
- Gaussian-attribute heads (xyz/rot/scale/alpha/color) used by spawning
  (pings.py:147-172): ``pos_dim=0`` (features only), ``out_k`` = number of
  spawned Gaussians per neural point; activations applied in spawn
  (pings_tpu.models.spawn).

Design note: instead of 8 separate nn.Modules we keep each decoder as a
pytree dict of (w, b) lists; heads are pure functions. MLPs are evaluated
inside fused jitted steps, batched over all query points at once — the MXU
sees one big (N, F) x (F, H) matmul per layer. No chunked ``mlp_batch``
needed: XLA handles large N, and shapes are static.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def init_mlp(
    key: jax.Array,
    in_dim: int,
    hidden_dim: int,
    hidden_level: int,
    out_dim: int,
    bias_on: bool = True,
    dtype=jnp.float32,
) -> Params:
    """He-init MLP: hidden_level hidden layers + linear head."""
    dims = [in_dim] + [hidden_dim] * max(hidden_level, 1) + [out_dim]
    ws: List[jnp.ndarray] = []
    bs: List[jnp.ndarray] = []
    keys = jax.random.split(key, 2 * (len(dims) - 1))
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        scale = jnp.sqrt(2.0 / d_in)
        ws.append(jax.random.normal(keys[2 * i], (d_in, d_out), dtype) * scale)
        # torch nn.Linear-style nonzero bias (uniform ±1/sqrt(fan_in)):
        # with zero-initialized neural-point features, zero biases would
        # make every head output exactly 0 — a dead fixed point for the
        # alpha-culled spawn path
        bound = 1.0 / jnp.sqrt(jnp.float32(d_in))
        bs.append(jax.random.uniform(keys[2 * i + 1], (d_out,), dtype,
                                     -bound, bound) if bias_on else None)
    return {"w": ws, "b": bs}


def mlp_forward(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(..., in_dim) -> (..., out_dim); ReLU between layers, linear head."""
    n = len(params["w"])
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        x = jnp.dot(x, w, preferred_element_type=jnp.float32)
        if b is not None:
            x = x + b
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------

def sdf_head(params: Params, feat: jnp.ndarray, sigma_scale: float) -> jnp.ndarray:
    """Feature -> signed distance (meters). sigma_scale =
    logistic_gaussian_ratio * sigma_sigmoid_m (model/decoder.py:102-104)."""
    return mlp_forward(params, feat)[..., 0] * sigma_scale


def color_head(params: Params, feat: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(mlp_forward(params, feat))


def sem_head(params: Params, feat: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(mlp_forward(params, feat), axis=-1)


def gaussian_head(params: Params, feat: jnp.ndarray, out_k: int) -> jnp.ndarray:
    """Feature -> (..., out_k, out_dim) raw attributes (activation in spawn)."""
    out = mlp_forward(params, feat)
    return out.reshape(out.shape[:-1] + (out_k, out.shape[-1] // out_k))


# ---------------------------------------------------------------------------
# The full decoder collection (8 MLPs, pings.py:147-172)
# ---------------------------------------------------------------------------

def init_decoders(key: jax.Array, cfg) -> Params:
    """Build all decoder pytrees from the config.

    Input feature layouts (matching reference call sites):
      - geo/sem/color decoders consume query_feature output:
        feature_dim (+3 neighbor-offset mean is folded into feature by
        query_feature's concat — see neural_points.query_feature).
      - gaussian heads consume the *point* geo+color features; alpha head
        concats normalized view distance (+1), color head concats view
        direction (+3) when enabled (pings.py:156-172).
    """
    K = cfg.spawn_n_gaussian
    gf = cfg.feature_dim + 3   # geo feature + weighted offset vector
    cf = cfg.color_feature_dim + 3
    point_f = cfg.feature_dim + cfg.color_feature_dim
    keys = jax.random.split(key, 8)
    d: Params = {}
    d["sdf"] = init_mlp(keys[0], gf, cfg.geo_mlp_hidden_dim,
                        cfg.geo_mlp_level, 1, cfg.mlp_bias_on)
    d["sem"] = init_mlp(keys[1], gf, cfg.sem_mlp_hidden_dim,
                        cfg.sem_mlp_level, cfg.sem_class_count, cfg.mlp_bias_on)
    d["color"] = init_mlp(keys[2], cf, cfg.color_mlp_hidden_dim,
                          cfg.color_mlp_level, 3, cfg.mlp_bias_on)
    gh, gl = cfg.gaussian_mlp_hidden_dim, cfg.gaussian_mlp_level
    d["gauss_xyz"] = init_mlp(keys[3], point_f, gh, gl, 3 * K, cfg.mlp_bias_on)
    d["gauss_rot"] = init_mlp(keys[4], point_f, gh, gl, 4 * K, cfg.mlp_bias_on)
    d["gauss_scale"] = init_mlp(keys[5], point_f, gh, gl, 3 * K, cfg.mlp_bias_on)
    alpha_in = point_f + (1 if cfg.dist_concat_on else 0)
    d["gauss_alpha"] = init_mlp(keys[6], alpha_in, gh, gl, 1 * K, cfg.mlp_bias_on)
    color_in = point_f + (3 if cfg.view_concat_on else 0)
    ch_out = (1 if cfg.monochrome else 3) * K
    d["gauss_color"] = init_mlp(keys[7], color_in, gh, gl, ch_out, cfg.mlp_bias_on)
    return d
