"""Field-independent per-point scan normals via voxel-covariance PCA.

The prerequisite for online incidence weighting (config.py rationale at
``incidence_weight_on``): the round-4 experiment showed incidence
weights computed from the *field gradient* halve the projective SDF
bias offline but destabilize the young map online, because early in a
region's life the gradient is untrained. These normals come purely from
the raw scan geometry, one fused dispatch per frame:

1. hash endpoints into a voxel grid (two independent hashes; slots whose
   two key-mins disagree are collision-corrupted and marked invalid),
2. scatter-add per-voxel count / sum / outer-product moments,
3. closed-form smallest eigenvector of the 3x3 covariance
   (trigonometric symmetric eigensolver + cross-product null space —
   no batched LAPACK eigh on the critical path),
4. each point inherits its voxel's plane normal, oriented toward the
   sensor; points in invalid/underpopulated voxels report cos = 1
   (no downweighting — the safe fallback).

Reference counterpart: none — data_sampler.py:157 leaves incidence
weighting as a TODO; PIN-SLAM estimates normals only for meshing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_P1, _P2, _P3 = 73856093, 19349669, 83492791      # neural_points primes
_Q1, _Q2, _Q3 = 2654435761, 805459861, 3266489917  # independent verify hash


def _keys(ijk: jnp.ndarray, m: int):
    i, j, k = ijk[:, 0], ijk[:, 1], ijk[:, 2]
    h = (i * _P1 ^ j * _P2 ^ k * _P3) & (m - 1)
    u = ijk.astype(jnp.uint32)
    v = (u[:, 0] * jnp.uint32(_Q1) ^ u[:, 1] * jnp.uint32(_Q2)
         ^ u[:, 2] * jnp.uint32(_Q3)).astype(jnp.int32)
    return h, v


def _smallest_eigvec(C: jnp.ndarray) -> jnp.ndarray:
    """(V, 3, 3) symmetric -> (V, 3) unit eigenvector of the smallest
    eigenvalue. Trigonometric eigenvalues + cross-product null space."""
    tr = jnp.trace(C, axis1=-2, axis2=-1)
    q = tr / 3.0
    A = C - q[:, None, None] * jnp.eye(3)
    p2 = jnp.sum(A * A, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detA = jnp.linalg.det(A / p[:, None, None])
    r = jnp.clip(detA / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eigenvalues: q + 2p cos(phi + 2k pi/3); smallest at k=1 shift
    lmin = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    B = C - lmin[:, None, None] * jnp.eye(3)
    # null space of B: largest cross product of row pairs
    c01 = jnp.cross(B[:, 0], B[:, 1])
    c02 = jnp.cross(B[:, 0], B[:, 2])
    c12 = jnp.cross(B[:, 1], B[:, 2])
    cands = jnp.stack([c01, c02, c12], axis=1)          # (V, 3, 3)
    norms = jnp.linalg.norm(cands, axis=-1)             # (V, 3)
    best = jnp.argmax(norms, axis=1)
    n = jnp.take_along_axis(cands, best[:, None, None], axis=1)[:, 0]
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    # degenerate (isotropic / empty) voxels: fall back to +z
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape)
    ok = nn[:, 0] > 1e-12
    return jnp.where(ok[:, None], n / jnp.maximum(nn, 1e-12), fallback), ok


@functools.partial(jax.jit, static_argnames=("voxel", "table_size",
                                             "min_pts"))
def scan_incidence_cos(points: jnp.ndarray, mask: jnp.ndarray,
                       origin: jnp.ndarray, voxel: float = 0.6,
                       table_size: int = 1 << 17,
                       min_pts: int = 4):
    """|cos| of the incidence angle between each ray (origin->point) and
    the local surface normal estimated from the scan itself.

    Returns (cos (N,) in (0, 1], normals (N, 3)); invalid estimates
    (collision, < min_pts in voxel, degenerate plane) report cos = 1.
    """
    m = table_size
    pts = jnp.where(mask[:, None], points, 1e6)
    ijk = jnp.floor(pts / voxel).astype(jnp.int32)
    h, v = _keys(ijk, m)

    w = mask.astype(jnp.float32)
    cnt = jnp.zeros((m,)).at[h].add(w)
    psum = jnp.zeros((m, 3)).at[h].add(points * w[:, None])
    # outer-product moments (6 unique entries)
    xx = points[:, :, None] * points[:, None, :]        # (N, 3, 3)
    msum = jnp.zeros((m, 3, 3)).at[h].add(xx * w[:, None, None])
    # collision detection: min and max of the verify key must agree
    vmin = jnp.full((m,), jnp.iinfo(jnp.int32).max, jnp.int32).at[h].min(
        jnp.where(mask, v, jnp.iinfo(jnp.int32).max))
    vmax = jnp.full((m,), jnp.iinfo(jnp.int32).min, jnp.int32).at[h].max(
        jnp.where(mask, v, jnp.iinfo(jnp.int32).min))

    c = jnp.maximum(cnt, 1.0)
    mean = psum / c[:, None]
    cov = msum / c[:, None, None] - mean[:, :, None] * mean[:, None, :]
    normals_v, nd_ok = _smallest_eigvec(cov)
    slot_ok = (cnt >= min_pts) & (vmin == vmax) & nd_ok

    n_pt = normals_v[h]                                  # (N, 3)
    ok_pt = slot_ok[h] & mask
    ray = points - origin
    ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True),
                            1e-9)
    # orient toward the sensor
    flip = jnp.sum(n_pt * ray, axis=-1) > 0
    n_pt = jnp.where(flip[:, None], -n_pt, n_pt)
    cos = jnp.abs(jnp.sum(n_pt * ray, axis=-1))
    cos = jnp.where(ok_pt, jnp.clip(cos, 1e-3, 1.0), 1.0)
    return cos, n_pt
