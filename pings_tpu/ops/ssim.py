"""Differentiable SSIM.

TPU-native counterpart of the reference ``fused-ssim`` CUDA submodule
(rahul-goel/fused-ssim; used every GS training iteration,
utils/mapper.py:50,1243,1922,1951) and the torch reference implementation
(gaussian_splatting/utils/loss_utils.py:189-219).

Implementation: separable 11x11 Gaussian window (two 1D convolutions
instead of one 2D — XLA fuses the elementwise SSIM math into the conv
epilogue, which is the "fused" part on TPU; no custom kernel needed to be
bandwidth-bound here). Matches the standard SSIM constants
(C1=0.01², C2=0.03², sigma=1.5).

Layout: images are (H, W, C) in [0, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gauss_kernel(window: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window) - window // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, window: int = 11) -> jnp.ndarray:
    """Separable Gaussian blur, 'valid' padding. x: (H, W, C)."""
    k = jnp.asarray(_gauss_kernel(window))
    h = jax.lax.conv_general_dilated(
        jnp.moveaxis(x, -1, 0)[:, None],            # (C, 1, H, W)
        k[None, None, :, None],                     # (1, 1, 11, 1)
        window_strides=(1, 1), padding="VALID",
    )                                               # (C, 1, H-10, W)
    hw = jax.lax.conv_general_dilated(
        h, k[None, None, None, :],                  # (1, 1, 1, 11)
        window_strides=(1, 1), padding="VALID",
    )                                               # (C, 1, H-10, W-10)
    return jnp.moveaxis(hw[:, 0], 0, -1)            # (H-10, W-10, C)


@functools.partial(jax.jit, static_argnames=("window",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window: int = 11,
         c1: float = 0.01**2, c2: float = 0.03**2) -> jnp.ndarray:
    """Mean SSIM over the valid region. img: (H, W, C) in [0,1]."""
    mu1 = _blur(img1, window)
    mu2 = _blur(img2, window)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window) - mu2_sq
    sigma12 = _blur(img1 * img2, window) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def dssim_loss(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """(1 - SSIM) / 2 — the GS training loss form (mapper.py:1243)."""
    return (1.0 - ssim(img1, img2)) / 2.0
