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
