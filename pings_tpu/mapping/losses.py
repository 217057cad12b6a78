"""SDF and photometric training losses.

Reference: utils/loss.py (sdf_bce_loss :45-63, sdf_diff_loss, color_diff_loss),
gaussian_splatting/utils/loss_utils.py (l1, ssim-adjacent losses,
opacity entropy :166-169, sky bce :171-180).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sdf_bce_loss(
    pred_sdf: jnp.ndarray,
    label_sdf: jnp.ndarray,
    weight: jnp.ndarray,
    sigma: float,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Binary cross entropy between occupancy logits.

    Reference (utils/loss.py:45-63): logits = pred/sigma vs target
    sigmoid(label/sigma). This turns projective-distance supervision into a
    soft occupancy classification, saturating for far free-space samples.
    """
    logits = pred_sdf / sigma
    target = jax.nn.sigmoid(label_sdf / sigma)
    # numerically-stable bce with logits
    loss = jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    w = weight * valid
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def eikonal_loss(grad: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """|| |∇f| - 1 ||² on sampled gradients (utils/mapper.py:940-960)."""
    gn = jnp.sqrt(jnp.sum(grad * grad, axis=-1) + 1e-12)
    err = (gn - 1.0) ** 2
    return jnp.sum(err * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def color_l1_loss(pred: jnp.ndarray, label: jnp.ndarray,
                  valid: jnp.ndarray) -> jnp.ndarray:
    err = jnp.mean(jnp.abs(pred - label), axis=-1)
    return jnp.sum(err * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def sem_nll_loss(log_prob: jnp.ndarray, label: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
    nll = -jnp.take_along_axis(log_prob, label[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


# ---------------------------------------------------------------------------
# Photometric (GS) losses
# ---------------------------------------------------------------------------

def l1_masked(pred: jnp.ndarray, target: jnp.ndarray,
              mask: jnp.ndarray | None = None) -> jnp.ndarray:
    err = jnp.abs(pred - target)
    if mask is None:
        return jnp.mean(err)
    m = jnp.broadcast_to(mask, err.shape)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def opacity_entropy_loss(alpha_map: jnp.ndarray) -> jnp.ndarray:
    """Encourage opaque-or-empty alpha (loss_utils.py:166-169)."""
    a = jnp.clip(alpha_map, 1e-5, 1.0 - 1e-5)
    return jnp.mean(-a * jnp.log(a))


def sky_bce_loss(alpha_map: jnp.ndarray, sky_mask: jnp.ndarray) -> jnp.ndarray:
    """Alpha should be 0 where the sky mask says sky (loss_utils.py:171-180).
    sky_mask: 1 = sky."""
    a = jnp.clip(alpha_map, 1e-5, 1.0 - 1e-5)
    target = 1.0 - sky_mask
    bce = -(target * jnp.log(a) + (1.0 - target) * jnp.log(1.0 - a))
    return jnp.mean(bce)


def normal_consistency_loss(normal: jnp.ndarray, d2n: jnp.ndarray,
                            mask: jnp.ndarray) -> jnp.ndarray:
    """1 - cosine between rendered normal map and depth-derived normal
    (utils/mapper.py:1279-1295)."""
    cos = jnp.sum(normal * d2n, axis=-1)
    m = mask
    return jnp.sum((1.0 - cos) * m) / jnp.maximum(jnp.sum(m), 1.0)


def isotropic_loss(scales: jnp.ndarray, valid: jnp.ndarray,
                   n_dims: int = 3) -> jnp.ndarray:
    """Penalize anisotropic gaussians (mapper.py:1392-1400): 3 scale dims
    for 3DGS, the first 2 for surfel/2DGS (the third is flat)."""
    s = scales[..., :n_dims]
    mean_s = jnp.mean(s, axis=-1, keepdims=True)
    err = jnp.mean(jnp.abs(s - mean_s), axis=-1)
    return jnp.sum(err * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def area_loss(scales: jnp.ndarray, valid: jnp.ndarray, voxel_size: float,
              n_dims: int = 2) -> jnp.ndarray:
    """Splat area (surfel/2DGS, s0*s1 / voxel^2) or volume (3DGS,
    s0*s1*s2 / voxel^3) regularizer (reference mapper.py:1404-1413)."""
    prod = jnp.prod(scales[..., :n_dims], axis=-1)
    norm = voxel_size ** n_dims
    return (jnp.sum(prod * valid) / jnp.maximum(jnp.sum(valid), 1.0)) / norm


def psnr(pred: jnp.ndarray, target: jnp.ndarray,
         mask: jnp.ndarray | None = None) -> jnp.ndarray:
    if mask is None:
        mse = jnp.mean((pred - target) ** 2)
    else:
        m = jnp.broadcast_to(mask, pred.shape)
        mse = jnp.sum(((pred - target) ** 2) * m) / jnp.maximum(jnp.sum(m), 1.0)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _central_diff_sq(x: jnp.ndarray) -> jnp.ndarray:
    """Squared channelwise central-difference norms in 4 shift directions,
    zero-padded at the borders: (H, W, C) -> (4, H, W) (reference
    central_diff, gaussian_splatting/utils/loss_utils.py:97-120)."""
    zc = jnp.zeros_like(x[:, :1])
    zr = jnp.zeros_like(x[:1])
    left = jnp.concatenate([x[:, :-1] - x[:, 1:], zc], axis=1)
    right = jnp.concatenate([zc, x[:, 1:] - x[:, :-1]], axis=1)
    up = jnp.concatenate([x[:-1] - x[1:], zr], axis=0)
    down = jnp.concatenate([zr, x[1:] - x[:-1]], axis=0)
    return jnp.stack([jnp.sum(d * d, axis=-1)
                      for d in (left, right, up, down)])


def normal_smooth_loss(normal: jnp.ndarray, depth: jnp.ndarray,
                       mask: jnp.ndarray,
                       normal_diff_sigma: float = 0.3,
                       depth_jump_thre_m: float = 0.02) -> jnp.ndarray:
    """Edge-aware normal smoothness (reference normal_smooth_loss,
    loss_utils.py:80-95, weighted into the GS loss at mapper.py:1299-1305):
    penalize neighboring-normal differences except across depth jumps
    (> depth_jump_thre, detached) and already-sharp normal edges
    (gaussian down-weighting with sigma)."""
    nd = _central_diff_sq(normal)                           # (4, H, W)
    dd = _central_diff_sq(jax.lax.stop_gradient(depth)[..., None])
    depth_mask = (dd <= depth_jump_thre_m ** 2).astype(jnp.float32)
    w = jnp.exp(-nd / (2.0 * normal_diff_sigma ** 2))
    return jnp.mean(depth_mask * w * nd * mask[None].astype(jnp.float32))


def tukey_loss(pred: jnp.ndarray, gt: jnp.ndarray,
               c: float = 4.685) -> jnp.ndarray:
    """Tukey biweight robust loss (reference tukey_loss,
    loss_utils.py:60-71; used by the inspector's per-view refine,
    inspect_pings.py:643). c <= 0 degrades to plain L1."""
    r = pred - gt
    if c <= 0:
        return jnp.mean(jnp.abs(r))
    inlier = (c * c / 6.0) * (1.0 - (1.0 - (r / c) ** 2) ** 3)
    return jnp.mean(jnp.where(jnp.abs(r) <= c, inlier, c * c / 6.0))


def incidence_weights(grad: jnp.ndarray, ray: jnp.ndarray,
                      floor: float = 0.1) -> jnp.ndarray:
    """Incidence-angle sample weights for projective SDF labels.

    Projective (along-ray) distance labels overestimate the true signed
    distance by 1/|cos| of the incidence angle between the ray and the
    surface normal; at grazing incidence (LiDAR ground returns) the
    mislabeled supervision biases the learned zero level set toward the
    sensor — measured at ~1-2 cm on the street-scale validation world
    and the dominant source of the tracker's per-frame (-2 cm x, +2 cm z)
    registration bias (RESULTS.md postmortem). The reference left this
    as a TODO (data_sampler.py:157 'add lower weight for surface samples
    with large incidence angle').

    grad: (N, 3) field gradient at the samples (FD or analytical —
    its direction estimates the surface normal); ray: (N, 3) unit
    sensor->sample directions. Returns (N,) weights in [floor, 1]:
    floor + (1 - floor) * |cos(grad, ray)|."""
    gn = grad / jnp.sqrt(
        jnp.sum(grad * grad, axis=-1, keepdims=True) + 1e-12)
    cos = jnp.abs(jnp.sum(gn * ray, axis=-1))
    return floor + (1.0 - floor) * cos
