"""Image / novel-view-synthesis metrics.

Reference: gaussian_splatting/utils/image_utils.py (psnr :1-60) and the
offline GS evaluation loop (utils/mapper.py:1691-2211) which reports PSNR /
SSIM / LPIPS / depth-L1 / depth-RMSE. LPIPS is a pure-JAX VGG16
implementation (eval/lpips.py); with real weights (PINGS_LPIPS_WEIGHTS)
the column is ``lpips``, with the deterministic random-VGG fallback it is
reported honestly as ``lpips_rand``.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp

from pings_tpu.mapping.losses import psnr as _psnr
from pings_tpu.ops.ssim import ssim as _ssim


def image_metrics(pred: np.ndarray, target: np.ndarray,
                  pred_depth: Optional[np.ndarray] = None,
                  target_depth: Optional[np.ndarray] = None,
                  with_lpips: bool = False,
                  ) -> Dict[str, float]:
    p = jnp.asarray(pred)
    t = jnp.asarray(target)
    out = {
        "psnr": float(_psnr(p, t)),
        "ssim": float(_ssim(p, t)),
    }
    if with_lpips:
        from pings_tpu.eval.lpips import lpips
        v, calibrated = lpips(pred, target)
        out["lpips" if calibrated else "lpips_rand"] = v
    if pred_depth is not None and target_depth is not None:
        m = target_depth > 1e-4
        if m.any():
            diff = np.abs(pred_depth - target_depth)[m]
            out["depth_l1_m"] = float(diff.mean())
            out["depth_rmse_m"] = float(np.sqrt((diff**2).mean()))
        else:
            out["depth_l1_m"] = float("nan")
            out["depth_rmse_m"] = float("nan")
    return out
