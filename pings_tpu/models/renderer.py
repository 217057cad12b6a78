"""The render path: camera model, spawning + rasterization + exposure.

TPU-native counterpart of ``render()``
(gaussian_splatting/gaussian_renderer/__init__.py:27-466) and ``CamImage``
(gaussian_splatting/utils/cameras.py): frustum-select local neural points,
decode K Gaussians each, concatenate pre-spawned frozen surrounding
Gaussians, rasterize with optional camera pose delta, then apply exposure
correction (affine 3x3+offset or scalar a/b, __init__.py:449-462).

The reference's OpenGL projection-matrix plumbing collapses to direct
intrinsics K here (our rasterizer projects with K; principal-point offsets
are native, graphics_utils.py:54-76 not needed).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pings_tpu.models.spawn import LocalPointData, SpawnedGaussians, spawn_gaussians
from pings_tpu.ops import rasterize as rz


def _use_pallas() -> bool:
    """Pick the fused Pallas blend on real accelerators; the portable XLA
    blend (the parity arbiter) on CPU, where Pallas would run interpreted."""
    return jax.default_backend() not in ("cpu",)


class CamView(NamedTuple):
    """A camera + target frame record (reference CamImage, cameras.py:22-259).

    Images are (H, W, C) float32 in [0, 1]; depth (H, W) meters (0 =
    missing); sky (H, W) 1=sky. T_c_w maps world -> camera."""
    K: jnp.ndarray
    T_c_w: jnp.ndarray
    rgb: jnp.ndarray
    depth: jnp.ndarray
    sky: jnp.ndarray
    frame_id: jnp.ndarray


class ExposureParams(NamedTuple):
    """Per-camera exposure correction (cameras.py:92-114).

    affine: rgb' = M @ rgb + o (3x3 + 3); scalar: rgb' = exp(a) * rgb + b."""
    mat: jnp.ndarray    # (3, 3)
    off: jnp.ndarray    # (3,)
    a: jnp.ndarray      # ()
    b: jnp.ndarray      # ()


def downsample_cam(cam: CamView, level: int) -> CamView:
    """Image-pyramid level of a CamView (reference CamImage pyramid,
    cameras.py:86-186): rgb 2x2-box (bilinear-equivalent) downsampling,
    depth/sky nearest-exact, intrinsics halved per level."""
    if level <= 0:
        return cam
    f = 1 << level
    h, w = cam.rgb.shape[:2]
    h2, w2 = h // f, w // f
    rgb = cam.rgb[:h2 * f, :w2 * f].reshape(h2, f, w2, f, 3).mean((1, 3))
    depth = cam.depth[::f, ::f][:h2, :w2]
    sky = cam.sky[::f, ::f][:h2, :w2]
    s = 1.0 / f
    # pixel-center convention: c' = (c + 0.5)/f - 0.5
    K = cam.K.at[0, 0].mul(s).at[1, 1].mul(s)
    K = K.at[0, 2].set((cam.K[0, 2] + 0.5) * s - 0.5)
    K = K.at[1, 2].set((cam.K[1, 2] + 0.5) * s - 0.5)
    return cam._replace(K=K, rgb=rgb, depth=depth, sky=sky)


def init_exposure() -> ExposureParams:
    return ExposureParams(jnp.eye(3), jnp.zeros(3), jnp.float32(0.0),
                          jnp.float32(0.0))


def apply_exposure(rgb: jnp.ndarray, e: ExposureParams,
                   affine: bool) -> jnp.ndarray:
    if affine:
        return jnp.clip(rgb @ e.mat.T + e.off, 0.0, 1.0)
    return jnp.clip(jnp.exp(e.a) * rgb + e.b, 0.0, 1.0)


def depth_to_normal(depth: jnp.ndarray, K: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-frame normal map from a depth map (reference depth2normal,
    gaussian_splatting/utils/point_utils.py:83-148): cross products of
    central-difference unprojected neighbors. Returns (normal (H,W,3),
    valid (H,W))."""
    h, w = depth.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    ys, xs = jnp.mgrid[0:h, 0:w]
    x = (xs + 0.5 - cx) / fx * depth
    y = (ys + 0.5 - cy) / fy * depth
    p = jnp.stack([x, y, depth], axis=-1)               # (H, W, 3)
    dzdx = 0.5 * (jnp.roll(p, -1, axis=1) - jnp.roll(p, 1, axis=1))
    dzdy = 0.5 * (jnp.roll(p, -1, axis=0) - jnp.roll(p, 1, axis=0))
    n = jnp.cross(dzdx, dzdy)
    nn = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    n = n / nn
    # flip toward camera
    n = n * jnp.where(n[..., 2:3] > 0, -1.0, 1.0)
    valid = (depth > 1e-4)
    valid &= jnp.roll(valid, 1, 0) & jnp.roll(valid, -1, 0)
    valid &= jnp.roll(valid, 1, 1) & jnp.roll(valid, -1, 1)
    valid = valid.at[0, :].set(False).at[-1, :].set(False)
    valid = valid.at[:, 0].set(False).at[:, -1].set(False)
    return n, valid


class RenderResult(NamedTuple):
    rgb: jnp.ndarray
    depth: jnp.ndarray
    alpha: jnp.ndarray
    normal: jnp.ndarray
    contrib: jnp.ndarray      # per spawned gaussian (local part only)
    gaussians: SpawnedGaussians
    n_overflow: jnp.ndarray
    depth_median: Optional[jnp.ndarray] = None  # surfel/2DGS modes
    distortion: Optional[jnp.ndarray] = None    # 2DGS mode


def render(
    local: LocalPointData,
    decoders,
    cam: CamView,
    width: int,
    height: int,
    *,
    exposure: Optional[ExposureParams] = None,
    affine_exposure: bool = False,
    theta: Optional[jnp.ndarray] = None,
    rho: Optional[jnp.ndarray] = None,
    surrounding: Optional[SpawnedGaussians] = None,
    bg: Optional[jnp.ndarray] = None,
    spawn_kwargs: Optional[dict] = None,
    tile: int = 16,
    max_per_tile: int = 512,
    chunk: int = 32,
    normalize_depth: bool = True,
    gs_type: str = "3d_gs",
    precision: str = "high",
    with_contrib: bool = False,
    raster_bins=None,
    return_bins: bool = False,
    bin_means=None,
    rebin_drift_px: float = 0.0,
):
    """Spawn + rasterize + exposure. Differentiable w.r.t. local point
    features, decoder params, exposure, and (theta, rho).

    gs_type selects the rasterizer like the reference render()
    (gaussian_renderer/__init__.py:88-98): "3d_gs" | "gaussian_surfel"
    (flat splats, per-pixel plane depth) | "2d_gs" (ray-disc
    intersection, median depth + distortion extras). 3d_gs and
    gaussian_surfel run the fused Pallas kernels on accelerators;
    ``precision`` selects their blend-dot precision, ``raster_bins``
    reuses a cached tile table (training-loop amortization), and
    ``return_bins=True`` additionally returns (bins, means2d snapshot)
    for the host-side cache + drift guard."""
    spawn_kwargs = spawn_kwargs or {}
    T_c_w = cam.T_c_w
    if theta is not None:
        T_c_w = rz.apply_pose_delta(T_c_w, theta, rho)
    cam_origin = -T_c_w[:3, :3].T @ T_c_w[:3, 3]

    visible = rz.mark_visible(local.positions, T_c_w, cam.K, width, height)
    g = spawn_gaussians(local, decoders, cam_origin, visible, **spawn_kwargs)

    if surrounding is not None:
        means = jnp.concatenate([g.means, surrounding.means])
        quats = jnp.concatenate([g.quats, surrounding.quats])
        scales = jnp.concatenate([g.scales, surrounding.scales])
        alphas = jnp.concatenate([g.alphas, surrounding.alphas])
        colors = jnp.concatenate([g.colors, surrounding.colors])
        valid = jnp.concatenate([g.valid, surrounding.valid])
    else:
        means, quats, scales = g.means, g.quats, g.scales
        alphas, colors, valid = g.alphas, g.colors, g.valid

    mode = {"3d_gs": "3dgs", "gaussian_surfel": "surfel",
            "2d_gs": "2dgs"}[gs_type]
    bins_out = None
    means2d = None
    if _use_pallas() and mode in ("3dgs", "surfel"):
        from pings_tpu.ops.raster_pallas import rasterize_pallas
        r = rasterize_pallas(
            means, quats, scales, alphas, colors, valid,
            T_c_w, cam.K, width, height, bg=bg,
            tile=tile, max_per_tile=max_per_tile,
            normalize_depth=normalize_depth, mode=mode,
            precision=precision, with_contrib=with_contrib,
            bins=raster_bins, return_bins=return_bins,
            bin_means=bin_means, rebin_drift_px=rebin_drift_px,
        )
        if return_bins:
            out, bins_out, means2d = r
        else:
            out = r
    else:
        out = rz.rasterize(
            means, quats, scales, alphas, colors, valid,
            T_c_w, cam.K, width, height, bg=bg,
            tile=tile, max_per_tile=max_per_tile, chunk=chunk,
            normalize_depth=normalize_depth, mode=mode,
            with_contrib=with_contrib,
        )
    rgb = out.rgb
    if exposure is not None:
        rgb = apply_exposure(rgb, exposure, affine_exposure)
    n_local = g.means.shape[0]
    res = RenderResult(
        rgb=rgb, depth=out.depth, alpha=out.alpha, normal=out.normal,
        contrib=out.contrib[:n_local], gaussians=g,
        n_overflow=out.n_overflow,
        depth_median=out.depth_median, distortion=out.distortion,
    )
    if return_bins:
        return res, bins_out, means2d
    return res
