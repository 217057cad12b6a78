"""LPIPS perceptual distance in pure JAX.

Reference usage: the offline GS evaluation reports LPIPS alongside
PSNR/SSIM (utils/mapper.py:1922-1951, via lpips.LPIPS('vgg')). The
canonical metric runs VGG16 conv features through learned linear heads
(Zhang et al., CVPR 2018).

This implementation reproduces the architecture exactly (VGG16 conv stack,
unit-normalized channel features at the 5 ReLU stages, 1x1 linear heads,
spatial mean, stage sum). Weights resolve in order:

1. ``PINGS_LPIPS_WEIGHTS`` env var / ``weights_path`` argument — an .npz
   with torchvision VGG16 ``features`` conv kernels (``conv{i}_w/b`` in
   OIHW) and LPIPS linear heads (``lin{0..4}_w``). Convert with
   ``scripts/export_lpips_weights.py`` on any machine with torchvision +
   lpips installed, then ship the file (zero-egress hosts cannot download).
2. Otherwise: a *deterministic randomly-initialized* VGG (seed 0). Random
   VGG features remain a meaningful perceptual metric (the LPIPS paper's
   "rand" baseline tracks human judgments far above pixel metrics), but
   the absolute scale differs from the published metric — so results are
   labeled ``lpips_rand`` rather than ``lpips``.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before)
_VGG_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
# indices (into the conv list) after whose ReLU LPIPS taps features
_TAPS = (1, 3, 6, 9, 12)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _random_weights(key) -> Dict[str, np.ndarray]:
    """He-initialized VGG16 + uniform linear heads (deterministic)."""
    w = {}
    cin = 3
    for i, (cout, _) in enumerate(_VGG_PLAN):
        key, k1 = jax.random.split(key)
        fan_in = cin * 9
        w[f"conv{i}_w"] = np.asarray(
            jax.random.normal(k1, (cout, cin, 3, 3))
            * np.sqrt(2.0 / fan_in), np.float32)
        w[f"conv{i}_b"] = np.zeros(cout, np.float32)
        cin = cout
    for j, t in enumerate(_TAPS):
        cout = _VGG_PLAN[t][0]
        w[f"lin{j}_w"] = np.full((cout,), 1.0 / cout, np.float32)
    return w


@functools.lru_cache(maxsize=2)
def _load_weights(weights_path: Optional[str]) -> Tuple[Dict, bool]:
    path = weights_path or os.environ.get("PINGS_LPIPS_WEIGHTS")
    if path and os.path.exists(path):
        data = np.load(path)
        return {k: np.asarray(data[k]) for k in data.files}, True
    return _random_weights(jax.random.PRNGKey(0)), False


def _features(x: jnp.ndarray, w: Dict) -> List[jnp.ndarray]:
    """x: (H, W, 3) in [0, 1] -> list of tapped feature maps (NHWC)."""
    # LPIPS input scaling: [-1, 1] then channel shift/scale
    h = (2.0 * x - 1.0 - _SHIFT) / _SCALE
    h = h[None]                                     # NHWC
    feats = []
    for i, (cout, pool) in enumerate(_VGG_PLAN):
        if pool:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
        k = jnp.asarray(w[f"conv{i}_w"])            # OIHW
        k = jnp.transpose(k, (2, 3, 1, 0))          # HWIO
        h = jax.lax.conv_general_dilated(
            h, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = h + jnp.asarray(w[f"conv{i}_b"])
        h = jax.nn.relu(h)
        if i in _TAPS:
            feats.append(h)
    return feats


@functools.partial(jax.jit, static_argnames=("weights_path",))
def _lpips_jit(a: jnp.ndarray, b: jnp.ndarray,
               weights_path: Optional[str]) -> jnp.ndarray:
    w, _ = _load_weights(weights_path)
    fa = _features(a, w)
    fb = _features(b, w)
    total = jnp.float32(0.0)
    for j, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / jnp.sqrt(jnp.sum(xa * xa, -1, keepdims=True) + 1e-10)
        nb = xb / jnp.sqrt(jnp.sum(xb * xb, -1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2                          # (1, H, W, C)
        lw = jnp.asarray(w[f"lin{j}_w"])
        total = total + jnp.mean(jnp.sum(d * lw, axis=-1))
    return total


def lpips(pred: np.ndarray, target: np.ndarray,
          weights_path: Optional[str] = None) -> Tuple[float, bool]:
    """Perceptual distance between two (H, W, 3) images in [0, 1].

    Returns (value, calibrated): calibrated=True when real LPIPS weights
    were loaded, False for the deterministic random-VGG fallback."""
    _, calibrated = _load_weights(
        weights_path or os.environ.get("PINGS_LPIPS_WEIGHTS"))
    v = _lpips_jit(jnp.asarray(pred, jnp.float32),
                   jnp.asarray(target, jnp.float32), weights_path)
    return float(v), calibrated
