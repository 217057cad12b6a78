"""Per-ray SDF training sample generation.

TPU-native counterpart of the reference DataSampler
(utils/data_sampler.py:18-245): for every measured LiDAR endpoint generate

- 1 exact endpoint sample (label 0 projective distance),
- ``surface_sample_n`` Gaussian-jittered near-surface samples,
- ``free_front_n`` uniform free-space samples between
  ``free_sample_begin_ratio * depth`` and ``surface - 2 sigma``,
- ``free_behind_n`` samples behind the surface up to
  ``free_sample_end_dist_m``.

Labels are signed projective distances along the ray (positive in front of /
outside the surface). Weights: distance-based decay for surface samples; the
reference marks freespace samples with a negative weight flag
(data_sampler.py:141-160) — we keep an explicit boolean ``is_free`` channel
instead (cleaner with static shapes).

Output is flat (N * S, ...) with a validity mask, ready for the replay pool.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


def sample_rays_cfg(key, endpoints, colors, mask, sensor_origin, cfg,
                    sem_labels=None, incid_cos=None):
    """sample_rays with all scales taken from the config."""
    return sample_rays(
        key, endpoints, colors, mask, sensor_origin,
        sem_labels=sem_labels, incid_cos=incid_cos,
        incid_floor=cfg.incidence_weight_floor,
        surface_sample_range_m=cfg.surface_sample_range_m,
        surface_sample_n=cfg.surface_sample_n,
        free_sample_begin_ratio=cfg.free_sample_begin_ratio,
        free_sample_end_dist_m=cfg.free_sample_end_dist_m,
        free_front_n=cfg.free_front_n,
        free_behind_n=cfg.free_behind_n,
        sigma_base=cfg.sigma_sigmoid_m,
        dist_weight_on=cfg.loss_weight_on,
        dist_weight_scale=cfg.dist_weight_scale,
        max_range=cfg.max_range,
    )


class SdfSamples(NamedTuple):
    points: jnp.ndarray     # (M, 3) world-frame sample positions
    sdf_label: jnp.ndarray  # (M,) signed projective distance (m)
    normal_label: jnp.ndarray  # (M, 3) per-sample ray direction (unit, sensor->point)
    color_label: jnp.ndarray   # (M, 3)
    sem_label: jnp.ndarray  # (M,) i32 class id; -1 = unlabeled (masked out)
    weight: jnp.ndarray     # (M,) loss weight
    is_free: jnp.ndarray    # (M,) True for freespace (non-surface) samples
    valid: jnp.ndarray      # (M,)


@functools.partial(
    jax.jit,
    static_argnames=(
        "surface_sample_n", "free_front_n", "free_behind_n",
        "surface_sample_range_m", "free_sample_begin_ratio",
        "free_sample_end_dist_m", "sigma_base", "dist_weight_on",
        "dist_weight_scale", "max_range", "incid_floor",
    ),
)
def sample_rays(
    key: jax.Array,
    endpoints: jnp.ndarray,      # (N, 3) world frame
    colors: jnp.ndarray,         # (N, 3)
    mask: jnp.ndarray,           # (N,)
    sensor_origin: jnp.ndarray,  # (3,) world frame
    sem_labels: jnp.ndarray | None = None,  # (N,) i32; -1 = unlabeled
    incid_cos: jnp.ndarray | None = None,   # (N,) |cos incidence| from
                                            # scan normals (ops.scan_normals)
    incid_floor: float = 0.1,
    surface_sample_range_m: float = 0.25,
    surface_sample_n: int = 3,
    free_sample_begin_ratio: float = 0.3,
    free_sample_end_dist_m: float = 1.0,
    free_front_n: int = 2,
    free_behind_n: int = 1,
    sigma_base: float = 0.1,
    dist_weight_on: bool = False,
    dist_weight_scale: float = 0.8,
    max_range: float = 60.0,
) -> SdfSamples:
    n = endpoints.shape[0]
    ray = endpoints - sensor_origin
    depth = jnp.linalg.norm(ray, axis=-1)
    raydir = ray / jnp.maximum(depth, 1e-6)[:, None]
    valid_ray = mask & (depth > 1e-3)

    k_surf, k_front, k_behind = jax.random.split(key, 3)

    # surface samples: endpoint + gaussian jitter along the ray
    # (data_sampler.py:62-88)
    jitter = (
        jax.random.normal(k_surf, (n, surface_sample_n))
        * surface_sample_range_m
    )
    zero = jnp.zeros((n, 1))
    surf_off = jnp.concatenate([zero, jitter], axis=1)  # (N, 1+Sn)

    # freespace front: uniform in [begin_ratio*depth, depth - 2*sigma]
    # (data_sampler.py:96-118)
    front_lo = free_sample_begin_ratio * depth
    front_hi = jnp.maximum(depth - 2.0 * sigma_base, front_lo + 1e-3)
    u = jax.random.uniform(k_front, (n, free_front_n))
    front_t = front_lo[:, None] + u * (front_hi - front_lo)[:, None]
    front_off = front_t - depth[:, None]                # negative of label sign; see below

    # behind: uniform in [depth + 2*sigma, depth + end_dist]
    ub = jax.random.uniform(k_behind, (n, free_behind_n))
    behind_t = (
        depth[:, None] + 2.0 * sigma_base
        + ub * (free_sample_end_dist_m - 2.0 * sigma_base)
    )
    behind_off = behind_t - depth[:, None]

    # offsets along ray relative to the endpoint; sample pos = origin + t*dir
    all_off = jnp.concatenate([surf_off, front_off, behind_off], axis=1)  # (N, S)
    S = all_off.shape[1]
    t_all = depth[:, None] + all_off
    pts = sensor_origin + raydir[:, None, :] * t_all[..., None]           # (N, S, 3)

    # labels: signed projective distance to the surface along the ray.
    # convention (matches reference sdf sign, loss.py:45-63): positive in
    # free space (in front of surface), negative behind.
    label = -all_off

    n_surf = 1 + surface_sample_n
    is_free = jnp.concatenate([
        jnp.zeros((n, n_surf), bool),
        jnp.ones((n, free_front_n + free_behind_n), bool),
    ], axis=1)

    # weights: optional distance decay (data_sampler.py:141-160)
    w = jnp.ones((n, S))
    if dist_weight_on:
        decay = 1.0 + dist_weight_scale * 0.5 * (
            1.0 - jnp.clip(depth / max_range, 0.0, 1.0)
        )
        w = w * decay[:, None]
    if incid_cos is not None:
        # field-independent incidence down-weighting of the projective
        # labels (the measured ~1 cm grazing-ground zero-crossing bias,
        # RESULTS.md): surface samples carry the bias, freespace BCE
        # saturates — weight the surface block only
        w_inc = incid_floor + (1.0 - incid_floor) * incid_cos
        w = jnp.where(is_free, w, w * w_inc[:, None])

    valid = jnp.broadcast_to(valid_ray[:, None], (n, S))
    # behind-surface samples past a thin structure can be wrong; the
    # reference down-weights behind samples implicitly via the BCE sigmoid
    # saturation. We keep weight 1 and rely on the same saturation.
    flat = lambda x: x.reshape((n * S,) + x.shape[2:])
    colors_rep = jnp.broadcast_to(colors[:, None, :], (n, S, 3))
    raydir_rep = jnp.broadcast_to(raydir[:, None, :], (n, S, 3))
    # semantic labels: surface samples inherit the ray endpoint's class,
    # freespace samples get 0 ("free" class, reference data_sampler.py
    # sem_label_tensor handling); unlabeled rays stay -1 everywhere.
    if sem_labels is None:
        sem_labels = jnp.full((n,), -1, jnp.int32)
    sem_rep = jnp.where(is_free, jnp.where(sem_labels[:, None] >= 0, 0, -1),
                        sem_labels[:, None].astype(jnp.int32))
    return SdfSamples(
        points=flat(pts),
        sdf_label=flat(label),
        normal_label=flat(raydir_rep),
        color_label=flat(colors_rep),
        sem_label=flat(sem_rep),
        weight=flat(w),
        is_free=flat(is_free),
        valid=flat(valid),
    )
