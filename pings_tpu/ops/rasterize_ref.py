"""Naive reference rasterizer — the correctness arbiter.

Per-pixel alpha blending over ALL gaussians, globally depth-sorted:
O(N * H * W), no tiling, no caps. Small scenes only. The tiled rasterizer
(pings_tpu.ops.rasterize) and the Pallas kernels must match this to
float tolerance; gradients are additionally checked against finite
differences of THIS implementation (SURVEY.md §7.3 item 5: with the CUDA
submodule sources absent, a trusted dense splatter + finite differences is
the parity arbiter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pings_tpu.ops.rasterize import (
    ProjectedGaussians,
    RenderOutput,
    apply_pose_delta,
    project_gaussians,
)


def rasterize_ref(
    means3d, quats, scales, opacities, colors, valid,
    T_c_w, K, width: int, height: int,
    theta=None, rho=None, bg=None,
    normalize_depth: bool = True,
    cutoff_q: float = 9.0, alpha_floor: float = 1.0 / 255.0,
) -> RenderOutput:
    if theta is not None:
        T_c_w = apply_pose_delta(T_c_w, theta, rho)
    if bg is None:
        bg = jnp.zeros(3)
    p = project_gaussians(means3d, quats, scales, opacities, colors, valid,
                          T_c_w, K, width, height)
    n = means3d.shape[0]

    order = jnp.argsort(jnp.where(p.valid, p.depth, jnp.inf))
    mu = p.means2d[order]
    con = p.conic[order]
    op = jnp.where(p.valid[order], p.opacity[order], 0.0)
    col = p.color[order]
    dep = p.depth[order]
    nor = p.normal[order]

    ys, xs = jnp.mgrid[0:height, 0:width]
    px = xs.reshape(-1) + 0.5   # (P,)
    py = ys.reshape(-1) + 0.5

    dx = px[None, :] - mu[:, 0:1]      # (N, P)
    dy = py[None, :] - mu[:, 1:2]
    q = con[:, 0:1] * dx * dx + con[:, 2:3] * dy * dy + 2 * con[:, 1:2] * dx * dy
    alpha = op[:, None] * jnp.exp(-0.5 * q)
    alpha = jnp.where((q < cutoff_q) & (alpha >= alpha_floor), alpha, 0.0)
    alpha = jnp.minimum(alpha, 0.999)

    one_m = 1.0 - alpha
    cp = jnp.cumprod(one_m, axis=0)
    excl = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], axis=0)
    w = alpha * excl                   # (N, P)

    rgb = (w[..., None] * col[:, None, :]).sum(0)        # (P, 3)
    a = w.sum(0)
    d = (w * dep[:, None]).sum(0)
    nrm = (w[..., None] * nor[:, None, :]).sum(0)
    trans = cp[-1]
    rgb = rgb + trans[:, None] * bg
    if normalize_depth:
        d = d / jnp.maximum(a, 0.05)   # same floor as blend_tiles

    contrib_sorted = w.sum(-1)
    contrib = jnp.zeros(n).at[order].set(contrib_sorted)
    return RenderOutput(
        rgb=rgb.reshape(height, width, 3),
        depth=d.reshape(height, width),
        alpha=a.reshape(height, width),
        normal=nrm.reshape(height, width, 3),
        contrib=contrib,
        n_overflow=jnp.int32(0),
    )
