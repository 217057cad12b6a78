"""Gaussian spawning: decode K Gaussians from each visible neural point.

TPU-native counterpart of ``spawn_gaussians``
(gaussian_splatting/gaussian_renderer/__init__.py:469-778):

- xyz   = point + displacement_range * tanh(mlp), rotated into the point's
          local frame (:605-639)
- rot   = normalize(mlp) ⊗ point quaternion (:644-649)
- scale = unit_scale * res * exp(mlp), clamped to max_scale * res; surfel
          mode keeps 2 dims and thins the third to 1e-7 (:655-670)
- alpha = tanh(mlp) in [-1, 1]; non-positive alphas are culled — here
          *zeroed*, which is gradient-equivalent since a zero-alpha
          Gaussian contributes nothing (ScaffoldGS trick, :684-687,
          :727-737; static-shape discipline per SURVEY.md §7.3-1)
- color = sigmoid(mlp), or base RGB + 0.1 * tanh residual (:706-716);
          optional view-direction (rotated into the point frame) and
          normalized view-distance concats (:677-698)

Static shapes: operates on a compacted local-point buffer of fixed length
L; output is (L*K,) arrays with a validity mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pings_tpu.models import decoder as dec
from pings_tpu.ops.transforms import quat_multiply, quat_normalize, quat_rotate


class SpawnedGaussians(NamedTuple):
    means: jnp.ndarray     # (L*K, 3)
    quats: jnp.ndarray     # (L*K, 4)
    scales: jnp.ndarray    # (L*K, 3)
    alphas: jnp.ndarray    # (L*K,) in [0, 1], 0 = culled
    colors: jnp.ndarray    # (L*K, 3)
    valid: jnp.ndarray     # (L*K,)
    alpha_raw: jnp.ndarray  # (L*K,) tanh output in [-1, 1] (for invalid-opacity loss)


class LocalPointData(NamedTuple):
    """Compacted local map view for rendering (reference gather_local_data,
    neural_gaussians.py:1135-1173)."""
    positions: jnp.ndarray   # (L, 3)
    quats: jnp.ndarray       # (L, 4)
    geo_feat: jnp.ndarray    # (L, F)
    color_feat: jnp.ndarray  # (L, Fc)
    rgb: jnp.ndarray         # (L, 3)
    valid: jnp.ndarray       # (L,)


def gather_local_data(m, mask: jnp.ndarray, size: int) -> LocalPointData:
    """Compact points selected by ``mask`` into fixed-size arrays."""
    idx = jnp.nonzero(mask, size=size, fill_value=m.capacity)[0]
    return LocalPointData(
        positions=m.positions[idx],
        quats=m.quats[idx],
        geo_feat=m.geo_feat[idx],
        color_feat=m.color_feat[idx],
        rgb=m.rgb[idx],
        valid=idx < m.capacity,
    )


def empty_spawned(n: int) -> SpawnedGaussians:
    """An all-invalid Gaussian buffer of fixed size (used as the
    surrounding-background placeholder before the decoder freezes, so the
    jitted training step keeps one signature)."""
    return SpawnedGaussians(
        means=jnp.zeros((n, 3)),
        quats=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1)),
        scales=jnp.full((n, 3), 1e-6),
        alphas=jnp.zeros((n,)),
        colors=jnp.zeros((n, 3)),
        valid=jnp.zeros((n,), bool),
        alpha_raw=jnp.zeros((n,)),
    )


def spawn_kwargs_from_cfg(cfg) -> dict:
    """The spawn_gaussians options implied by a Config (single source for
    the mapper, GUI/inspector, and eval render paths)."""
    return dict(
        spawn_k=cfg.spawn_n_gaussian,
        voxel_size=cfg.voxel_size_m,
        displacement_range_ratio=cfg.displacement_range_ratio,
        unit_scale_ratio=cfg.unit_scale_ratio,
        max_scale_ratio=cfg.max_scale_ratio,
        surfel_mode=(cfg.gs_type == "gaussian_surfel"),
        dist_concat=cfg.dist_concat_on,
        view_concat=cfg.view_concat_on,
        color_residual=cfg.learn_color_residual,
        max_range=cfg.max_range,
    )


@functools.partial(
    jax.jit,
    static_argnames=("spawn_k", "voxel_size", "displacement_range_ratio",
                     "unit_scale_ratio", "max_scale_ratio", "surfel_mode",
                     "dist_concat", "view_concat", "color_residual",
                     "max_range"))
def spawn_gaussians(
    pts: LocalPointData,
    decoders,
    cam_origin: jnp.ndarray,     # (3,)
    visible: jnp.ndarray,        # (L,) frustum mask
    *,
    spawn_k: int = 8,
    voxel_size: float = 0.3,
    displacement_range_ratio: float = 1.0,
    unit_scale_ratio: float = 0.5,
    max_scale_ratio: float = 3.0,
    surfel_mode: bool = False,
    dist_concat: bool = True,
    view_concat: bool = True,
    color_residual: bool = True,
    max_range: float = 60.0,
) -> SpawnedGaussians:
    L = pts.positions.shape[0]
    K = spawn_k
    feat = jnp.concatenate([pts.geo_feat, pts.color_feat], axis=-1)  # (L, F+Fc)
    ok = pts.valid & visible

    # view geometry in the point's local frame (:677-698)
    view = pts.positions - cam_origin
    view_dist = jnp.sqrt(jnp.sum(view * view, axis=-1, keepdims=True) + 1e-12)
    view_dir = view / view_dist
    inv_q = quat_normalize(pts.quats) * jnp.array([1.0, -1, -1, -1])
    view_dir_local = quat_rotate(inv_q, view_dir)

    # displacement head -> local offsets rotated by the point quaternion
    disp_range = displacement_range_ratio * voxel_size
    xyz_raw = dec.gaussian_head(decoders["gauss_xyz"], feat, K)      # (L,K,3)
    local_off = disp_range * jnp.tanh(xyz_raw)
    off_world = quat_rotate(pts.quats[:, None, :], local_off)
    means = pts.positions[:, None, :] + off_world                    # (L,K,3)

    # rotation head — biased toward identity so the zero-feature init
    # yields a unit quaternion with finite gradients
    rot_raw = dec.gaussian_head(decoders["gauss_rot"], feat, K)      # (L,K,4)
    rot_raw = rot_raw + jnp.array([1.0, 0.0, 0.0, 0.0])
    quats = quat_multiply(quat_normalize(rot_raw),
                          pts.quats[:, None, :])                     # (L,K,4)

    # scale head
    scale_raw = dec.gaussian_head(decoders["gauss_scale"], feat, K)  # (L,K,3)
    unit = unit_scale_ratio * voxel_size
    scales = jnp.minimum(unit * jnp.exp(scale_raw),
                         max_scale_ratio * voxel_size)
    if surfel_mode:
        scales = scales.at[..., 2].set(1e-7)

    # alpha head (+ normalized view distance)
    a_in = feat
    if dist_concat:
        a_in = jnp.concatenate([feat, view_dist / max_range], axis=-1)
    alpha_raw = jnp.tanh(
        dec.gaussian_head(decoders["gauss_alpha"], a_in, K)[..., 0]) # (L,K)
    alphas = jnp.maximum(alpha_raw, 0.0)

    # color head (+ view direction in the point frame)
    c_in = feat
    if view_concat:
        c_in = jnp.concatenate([feat, view_dir_local], axis=-1)
    col_raw = dec.gaussian_head(decoders["gauss_color"], c_in, K)    # (L,K,3|1)
    if color_residual:
        colors = jnp.clip(
            pts.rgb[:, None, :] + 0.1 * jnp.tanh(col_raw), 0.0, 1.0)
    else:
        colors = jax.nn.sigmoid(col_raw)
    if colors.shape[-1] == 1:
        colors = jnp.broadcast_to(colors, colors.shape[:-1] + (3,))

    valid = jnp.broadcast_to(ok[:, None], (L, K)) & (alphas > 0.0)
    flat = lambda x: x.reshape((L * K,) + x.shape[2:])
    return SpawnedGaussians(
        means=flat(means), quats=flat(quats), scales=flat(scales),
        alphas=flat(alphas), colors=flat(colors), valid=flat(valid),
        alpha_raw=flat(alpha_raw),
    )
