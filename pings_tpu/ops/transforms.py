"""Geometry primitives: quaternions, SE(3), voxel downsampling, deskewing,
camera projection.

TPU-native counterpart of the reference's tensor utilities
(reference: utils/tools.py:743-844 quaternion algebra, :888-921 transforms,
:924-1009 voxel downsample, :1088-1177 deskewing/slerp, :1242-1327 camera
projection). Everything here is pure jnp, jit-friendly, static-shape with
masks; pose *composition* across frames stays on host in float64 (see
pings_tpu.utils.pose for the numpy f64 twin of the SE(3) helpers).

Conventions:
- Quaternions are (w, x, y, z), Hamilton, unit norm.
- Transforms are 4x4 row-major; points are row vectors, ``p' = (T @ [p;1])``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Primes used by the reference spatial hash (model/neural_gaussians.py:80-88).
HASH_PRIMES = (73856093, 19349669, 83492791)


# --------------------------------------------------------------------------
# Quaternion algebra (wxyz)
# --------------------------------------------------------------------------

def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    # sqrt(sum + eps) keeps the gradient finite at q = 0 (plain
    # linalg.norm has a NaN gradient there)
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)
    return q / n


def safe_normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalize with a finite gradient at v = 0."""
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)
    return v / n


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b, broadcasting over leading dims."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0.

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select by the largest diagonal combination (stable under jit).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # candidate 0: trace
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0], axis=-1)
    # candidate 1: m00 largest
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)
    # candidate 2: m11 largest
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], axis=-1)
    # candidate 3: m22 largest
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], axis=-1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray,
               eps: float = 1e-7) -> jnp.ndarray:
    """Spherical interpolation between q0 and q1 at fraction t (broadcast)."""
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    near = sin_theta < eps
    t = jnp.asarray(t)
    if t.ndim < q0.ndim:
        t = t[..., None]
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_theta))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_theta))
    return quat_normalize(w0 * q0 + w1 * q1)


# --------------------------------------------------------------------------
# SE(3)
# --------------------------------------------------------------------------

def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 transform(s) to points (..., N, 3)."""
    return pts @ T[..., :3, :3].mT + T[..., None, :3, 3]


def so3_exp(w: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rodrigues: axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Differentiable at w = 0: branches take sqrt only of values bounded away
    from zero (the naive ``where(small, series, sin(norm)/norm)`` still
    propagates NaN through the untaken branch's sqrt gradient)."""
    t2 = jnp.sum(w * w, axis=-1, keepdims=True)
    small = t2 < eps
    t2_safe = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2_safe)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1 - jnp.cos(theta)) / t2_safe)
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None] * K + b[..., None] * (K @ K)


def skew(w: jnp.ndarray) -> jnp.ndarray:
    wx, wy, wz = jnp.moveaxis(w, -1, 0)
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [z, -wz, wy, wz, z, -wx, -wy, wx, z], axis=-1
    ).reshape(w.shape[:-1] + (3, 3))


def se3_exp(xi: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Twist (..., 6) = [rho(trans), phi(rot)] -> 4x4 transform.

    Matches the retraction used by the reference tracker
    (utils/tracker.py:659-660 expmap on [translation, rotation]).
    Differentiable at xi = 0 (see so3_exp).
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    t2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = t2 < eps
    t2_safe = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2_safe)
    R = so3_exp(phi)
    K = skew(phi)
    a = jnp.where(small, 0.5 - t2 / 24.0, (1 - jnp.cos(theta)) / t2_safe)
    b = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta)) / (t2_safe * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + a[..., None] * K + b[..., None] * (K @ K)
    t = (V @ rho[..., None])[..., 0]
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(R.mT)
    Ti = Ti.at[..., :3, 3].set(-(R.mT @ t[..., None])[..., 0])
    Ti = Ti.at[..., 3, 3].set(1.0)
    return Ti


def slerp_pose(T0: jnp.ndarray, T1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Interpolate two 4x4 poses: slerp rotation + lerp translation.

    Reference: utils/tools.py:1165-1177 (slerp_pose).
    """
    q0 = rotmat_to_quat(T0[..., :3, :3])
    q1 = rotmat_to_quat(T1[..., :3, :3])
    q = quat_slerp(q0, q1, t)
    tt = jnp.asarray(t)
    if tt.ndim < T0[..., 0, 0].ndim + 1:
        tt = tt[..., None]
    trans = (1.0 - tt) * T0[..., :3, 3] + tt * T1[..., :3, 3]
    T = jnp.zeros(jnp.broadcast_shapes(T0.shape, T1.shape), dtype=T0.dtype)
    T = T.at[..., :3, :3].set(quat_to_rotmat(q))
    T = T.at[..., :3, 3].set(trans)
    T = T.at[..., 3, 3].set(1.0)
    return T


# --------------------------------------------------------------------------
# Voxel hashing & downsampling
# --------------------------------------------------------------------------

def voxel_hash(coords: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Hash integer voxel coords (..., 3) -> bucket id in [0, table_size).

    Same 3-prime scheme as the reference (model/neural_gaussians.py:80-88);
    arithmetic in int32 with deliberate wraparound, bucket by unsigned mod.
    """
    c = coords.astype(jnp.int32)
    p = jnp.array(HASH_PRIMES, dtype=jnp.int32)
    h = c[..., 0] * p[0] ^ c[..., 1] * p[1] ^ c[..., 2] * p[2]
    # map int32 -> [0, table_size) without negative results
    return jnp.abs(h) % jnp.int32(table_size)


def voxel_down_sample_mask(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    voxel_size: float | jnp.ndarray,
    table_size: int = 1 << 20,
) -> jnp.ndarray:
    """One point per voxel (closest to voxel center); returns a keep-mask.

    TPU-native re-design of the reference scatter-argmin trick
    (utils/tools.py:924-967): instead of a dense grid we hash voxel coords to
    a fixed-size bucket space and use two segment_min passes (distance, then
    index tie-break). Hash collisions between *different* voxels drop a few
    extra points, which is harmless for downsampling. Static shapes: invalid
    points (mask=False) are routed to bucket table_size (an overflow slot).
    """
    n = points.shape[0]
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    center = (coords.astype(points.dtype) + 0.5) * voxel_size
    dist2 = jnp.sum((points - center) ** 2, axis=-1)
    bucket = voxel_hash(coords, table_size)
    bucket = jnp.where(mask, bucket, table_size)

    min_d = jax.ops.segment_min(dist2, bucket, num_segments=table_size + 1)
    is_min = dist2 <= min_d[bucket]
    idx = jnp.arange(n, dtype=jnp.int32)
    idx_sel = jnp.where(is_min & mask, idx, jnp.int32(n))
    winner = jax.ops.segment_min(idx_sel, bucket, num_segments=table_size + 1)
    return (winner[bucket] == idx) & mask


# --------------------------------------------------------------------------
# Deskewing (motion compensation)
# --------------------------------------------------------------------------

def deskew_points(
    points: jnp.ndarray,
    ts_norm: jnp.ndarray,
    T_rel: jnp.ndarray,
    ref_frac: float = 1.0,
) -> jnp.ndarray:
    """Per-point motion compensation toward the pose at ``ref_frac``.

    ``T_rel`` is the relative motion over the sweep (last-to-first frame
    convention of the reference, utils/tools.py:1088-1163): each point at
    normalized time t in [0,1] is moved by slerp(I, T_rel, ref_frac - t).

    points (N, 3), ts_norm (N,) in [0, 1].
    """
    n = points.shape[0]
    frac = ref_frac - ts_norm
    q1 = jnp.broadcast_to(rotmat_to_quat(T_rel[:3, :3]), (n, 4))
    q_eye = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0, 0.0], dtype=points.dtype), (n, 4))
    q = quat_slerp(q_eye, q1, frac)
    t = frac[:, None] * T_rel[:3, 3]
    return quat_rotate(q, points) + t, frac


def deskew(points, ts_norm, T_rel, ref_frac: float = 1.0):
    out, _ = deskew_points(points, ts_norm, T_rel, ref_frac)
    return out


# --------------------------------------------------------------------------
# Camera projection
# --------------------------------------------------------------------------

def project_points_to_cam(
    points_w: jnp.ndarray,
    mask: jnp.ndarray,
    T_c_w: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    min_depth: float = 0.1,
    max_depth: float = 1e4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project world points into a pinhole camera.

    Returns (uv float (N,2), depth (N,), valid mask (N,)).
    Reference: utils/tools.py:1242-1327 (project_points_to_cam_torch).
    """
    pc = transform_points(T_c_w, points_w)
    z = pc[..., 2]
    u = K[0, 0] * pc[..., 0] / z + K[0, 2]
    v = K[1, 1] * pc[..., 1] / z + K[1, 2]
    valid = (
        mask
        & (z > min_depth)
        & (z < max_depth)
        & (u >= 0) & (u < width)
        & (v >= 0) & (v < height)
    )
    return jnp.stack([u, v], axis=-1), z, valid


def splat_depth_map(
    uv: jnp.ndarray,
    depth: jnp.ndarray,
    valid: jnp.ndarray,
    width: int,
    height: int,
) -> jnp.ndarray:
    """Min-depth z-buffer splat of projected points -> (H, W) depth map,
    0 where empty. Deterministic segment_min replaces the reference's
    nondeterministic scatter_reduce(amin) (utils/tools.py:1290).
    """
    px = jnp.clip(uv[..., 0].astype(jnp.int32), 0, width - 1)
    py = jnp.clip(uv[..., 1].astype(jnp.int32), 0, height - 1)
    lin = py * width + px
    lin = jnp.where(valid, lin, width * height)
    d = jnp.where(valid, depth, jnp.inf)
    dm = jax.ops.segment_min(d, lin, num_segments=width * height + 1)[:-1]
    dm = jnp.where(jnp.isfinite(dm), dm, 0.0)
    return dm.reshape(height, width)


def colorize_points(
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    image: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample image colors at projected pixel locations (nearest).

    image (H, W, 3) in [0,1]. Returns (colors (N,3), valid)."""
    h, w = image.shape[:2]
    px = jnp.clip(uv[..., 0].astype(jnp.int32), 0, w - 1)
    py = jnp.clip(uv[..., 1].astype(jnp.int32), 0, h - 1)
    colors = image[py, px]
    return jnp.where(valid[..., None], colors, 0.0), valid


# --------------------------------------------------------------------------
# Misc
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("fov_deg",))
def crop_range_mask(points: jnp.ndarray, min_range: float, max_range: float,
                    min_z: float = -jnp.inf, max_z: float = jnp.inf,
                    fov_deg: float | None = None) -> jnp.ndarray:
    """Range/height crop mask for raw LiDAR scans
    (reference: dataset/slam_dataset.py:584-621 crop_frame)."""
    r = jnp.linalg.norm(points, axis=-1)
    m = (r > min_range) & (r < max_range)
    m &= (points[..., 2] > min_z) & (points[..., 2] < max_z)
    return m
