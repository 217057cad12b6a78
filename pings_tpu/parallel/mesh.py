"""Multi-chip sharding: device mesh, sharded rendering and training.

No reference counterpart — the reference is single-process single-GPU
(SURVEY.md §2.3). This layer is the TPU-native scale-out design:

- **Mesh axes.** ``data`` shards cameras/frames (data parallel);
  ``tile`` shards image tiles of a single render. ICI carries the
  collectives inside a slice; DCN across hosts (same code path — the mesh
  just spans more devices).
- **Sharded render** (``render_sharded``): Gaussian projection and
  binning are computed per-device on a replicated Gaussian set (cheap,
  O(N)); the alpha-blend — the dominant cost — runs with the *tile* axis
  sharded, so each chip blends its slice of the image. No cross-device
  compositing is needed because compositing is per-pixel.
- **Data-parallel training** (``make_dp_train_step``): parameters
  replicated, a batch of cameras sharded over ``data``; XLA inserts the
  gradient ``psum`` during the backward pass (overlapped with bwd compute
  by the XLA scheduler — the reference's NCCL role, SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pings_tpu.mapping import losses
from pings_tpu.models.renderer import CamView
from pings_tpu.ops import rasterize as rz
from pings_tpu.ops.ssim import dssim_loss


def make_mesh(n_devices: Optional[int] = None,
              axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


# ---------------------------------------------------------------------------
# Tile-sharded rendering
# ---------------------------------------------------------------------------

def render_sharded(
    mesh: Mesh,
    means3d, quats, scales, opacities, colors, valid,
    T_c_w, K, width: int, height: int,
    bg=None, tile: int = 16, max_span: int = 64, max_per_tile: int = 512,
    chunk: int = 32,
):
    """Rasterize with image tiles sharded across the mesh.

    The per-tile gather tables (T, Kmax) and the blend working set are
    sharded on the tile axis; gaussian attribute arrays are replicated.
    Requires the tile count to be divisible by the mesh size (pad the
    image accordingly)."""
    if bg is None:
        bg = jnp.zeros(3)

    naxis = mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    tile_shard = NamedSharding(mesh, P(naxis))

    @functools.partial(jax.jit,
                       static_argnames=("width", "height"))
    def _render(means3d, quats, scales, opacities, colors, valid, T_c_w, K,
                width, height, bg):
        p = rz.project_gaussians(means3d, quats, scales, opacities, colors,
                                 valid, T_c_w, K, width, height)
        bins = rz.bin_gaussians(p, width, height, tile=tile,
                                max_span=max_span, max_per_tile=max_per_tile)
        n_tiles = bins.gauss_tbl.shape[0]
        bins = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, tile_shard if x.ndim >= 1 and x.shape[0] == n_tiles
                else repl),
            bins)
        return rz.blend_tiles(p, bins, bg, width, height, tile=tile,
                              chunk=chunk)

    with mesh:
        return _render(means3d, quats, scales, opacities, colors, valid,
                       T_c_w, K, width, height, bg)


# ---------------------------------------------------------------------------
# Gaussian-primitive sharding (spawn sharded, blend tile-sharded)
# ---------------------------------------------------------------------------

def render_gauss_sharded(
    mesh: Mesh,
    local,                       # LocalPointData, point axis shardable
    decoders,
    cam: CamView,
    width: int, height: int,
    bg=None, spawn_kwargs=None,
    tile: int = 16, max_span: int = 36, max_per_tile: int = 512,
    chunk: int = 32,
):
    """Gaussian-primitive-sharded rendering (BASELINE.json north star:
    "Gaussian-primitive sharding with per-tile all-gather of visible
    points").

    Layout: the neural-point buffer (and so the spawned Gaussians — the
    FLOP-heavy 5-head MLP decode) is sharded over the mesh; each device
    spawns only its shard, then the projected Gaussian attributes are
    ``all_gather``ed (14 floats/Gaussian — orders of magnitude smaller
    than per-tile tables) and every device bins + alpha-blends only its
    slice of the image tiles. Compositing is per-pixel, so no cross-device
    blend pass is needed. Collectives ride ICI inside a slice; the same
    code spans hosts over DCN.
    """
    from pings_tpu.models.spawn import spawn_gaussians

    if bg is None:
        bg = jnp.zeros(3)
    spawn_kwargs = spawn_kwargs or {}
    naxis = mesh.axis_names[0]
    nd = mesh.devices.size
    L = local.positions.shape[0]
    assert L % nd == 0, "local point count must divide the mesh"

    T_c_w = cam.T_c_w
    cam_origin = -T_c_w[:3, :3].T @ T_c_w[:3, 3]

    def shard_fn(local_shard):
        visible = rz.mark_visible(local_shard.positions, T_c_w, cam.K,
                                  width, height)
        g = spawn_gaussians(local_shard, decoders, cam_origin, visible,
                            **spawn_kwargs)
        # per-device projection of the local spawn, then all-gather the
        # *projected* attributes (compact: 14 f32 per gaussian)
        p = rz.project_gaussians(g.means, g.quats, g.scales, g.alphas,
                                 g.colors, g.valid, T_c_w, cam.K,
                                 width, height)
        p_all = jax.tree.map(
            lambda x: jax.lax.all_gather(x, naxis, axis=0, tiled=True), p)
        return p_all

    in_spec = jax.tree.map(lambda _: P(naxis), local)
    p_full = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(in_spec,), out_specs=P(),
        check_vma=False)(local)

    # bin once (replicated — cheap), blend with the tile axis sharded
    # (falls back to replicated blending when the tile count does not
    # divide the mesh — tiny images only)
    p_struct = jax.tree.map(jax.lax.stop_gradient, p_full)
    bins = rz.bin_gaussians(p_struct, width, height, tile=tile,
                            max_span=max_span, max_per_tile=max_per_tile)
    n_tiles = bins.gauss_tbl.shape[0]
    tile_shard = NamedSharding(mesh, P(naxis))
    repl = NamedSharding(mesh, P())
    if n_tiles % nd == 0:
        bins = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, tile_shard if x.ndim >= 1 and x.shape[0] == n_tiles
                else repl), bins)
    return rz.blend_tiles(p_full, bins, bg, width, height, tile=tile,
                          chunk=chunk)


def make_gauss_sharded_train_step(cfg, optimizer, mesh: Mesh, width: int,
                                  height: int, local_size: int):
    """Model-parallel training: ONE camera per step, the spawn + projection
    (the FLOP-heavy 5-head MLP decode) sharded over the mesh's point axis
    via ``render_gauss_sharded``; the backward transposes the all-gather
    into a reduce-scatter of projected-attribute gradients, and feature /
    MLP gradient psums ride the same axis. This is the sharded *training*
    step (not just the forward): use it when a single frame's gaussian
    count is the scaling axis rather than the camera batch.

    step(params, opt_state, static_map, decoders, local_idx, cam)
      -> (params, opt_state, psnr)
    """
    from pings_tpu.mapping.gs_mapper import apply_gs_params
    from pings_tpu.models.spawn import LocalPointData
    import optax

    spawn_kwargs = dict(
        spawn_k=cfg.spawn_n_gaussian, voxel_size=cfg.voxel_size_m,
        displacement_range_ratio=cfg.displacement_range_ratio,
        unit_scale_ratio=cfg.unit_scale_ratio,
        max_scale_ratio=cfg.max_scale_ratio,
        surfel_mode=(cfg.gs_type == "gaussian_surfel"),
        dist_concat=cfg.dist_concat_on, view_concat=cfg.view_concat_on,
        color_residual=cfg.learn_color_residual, max_range=cfg.max_range,
    )
    bg = jnp.asarray(cfg.bg_color, jnp.float32)

    def loss_fn(params, static_map, decoders, local_idx, cam):
        m, d = apply_gs_params(static_map, decoders, params)
        local = LocalPointData(
            positions=m.positions[local_idx], quats=m.quats[local_idx],
            geo_feat=m.geo_feat[local_idx],
            color_feat=m.color_feat[local_idx], rgb=m.rgb[local_idx],
            valid=(local_idx < m.capacity) & m.valid_gs_mask[local_idx])
        res = render_gauss_sharded(
            mesh, local, d, cam, width, height, bg=bg,
            spawn_kwargs=spawn_kwargs, tile=cfg.tile_size,
            max_per_tile=cfg.max_gs_per_tile, chunk=32)
        l1 = losses.l1_masked(res.rgb, cam.rgb)
        ds = dssim_loss(res.rgb, cam.rgb)
        photo = (1 - cfg.lambda_ssim) * l1 + cfg.lambda_ssim * ds
        dmask = (cam.depth > 1e-4) & (res.alpha > 0.5)
        dl1 = losses.l1_masked(res.depth, cam.depth, dmask)
        return (photo + cfg.lambda_depth * dl1
                + cfg.lambda_opacity_ent
                * losses.opacity_entropy_loss(res.alpha)), \
            losses.psnr(res.rgb, cam.rgb)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, static_map, decoders, local_idx, cam):
        (_, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, static_map, decoders, local_idx, cam)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, psnr

    return step


# ---------------------------------------------------------------------------
# Data-parallel joint training step (cameras sharded)
# ---------------------------------------------------------------------------

def make_dp_train_step(cfg, optimizer, mesh: Mesh, width: int, height: int,
                       local_size: int):
    """Data-parallel gsdf training: each device renders + differentiates
    one (or more) cameras of the batch; losses are averaged and feature /
    MLP gradients all-reduced (XLA psum via replicated-param jit).

    step(params, opt_state, static_map, decoders, local_idx, cams,
         sdf_batch) -> (params, opt_state, metrics)

    ``cams``: a CamView pytree with a leading batch axis sharded on the
    mesh's data axis.
    """
    from pings_tpu.mapping.gs_mapper import apply_gs_params
    from pings_tpu.models import field
    from pings_tpu.models.spawn import LocalPointData
    from pings_tpu.models.renderer import render
    import optax

    naxis = mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P(naxis))

    spawn_kwargs = dict(
        spawn_k=cfg.spawn_n_gaussian, voxel_size=cfg.voxel_size_m,
        displacement_range_ratio=cfg.displacement_range_ratio,
        unit_scale_ratio=cfg.unit_scale_ratio,
        max_scale_ratio=cfg.max_scale_ratio,
        surfel_mode=(cfg.gs_type == "gaussian_surfel"),
        dist_concat=cfg.dist_concat_on, view_concat=cfg.view_concat_on,
        color_residual=cfg.learn_color_residual, max_range=cfg.max_range,
    )
    sigma_scale = cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m
    sigma = cfg.sigma_sigmoid_m
    bg = jnp.asarray(cfg.bg_color, jnp.float32)

    def cam_loss(params, static_map, decoders, local_idx, cam: CamView):
        m, d = apply_gs_params(static_map, decoders, params)
        local = LocalPointData(
            positions=m.positions[local_idx], quats=m.quats[local_idx],
            geo_feat=m.geo_feat[local_idx],
            color_feat=m.color_feat[local_idx], rgb=m.rgb[local_idx],
            valid=(local_idx < m.capacity) & m.valid_gs_mask[local_idx])
        res = render(local, d, cam, width, height, bg=bg,
                     spawn_kwargs=spawn_kwargs, tile=cfg.tile_size,
                     max_per_tile=cfg.max_gs_per_tile, chunk=32,
                     gs_type=cfg.gs_type, precision=cfg.raster_precision)
        l1 = losses.l1_masked(res.rgb, cam.rgb)
        ds = dssim_loss(res.rgb, cam.rgb)
        photo = (1 - cfg.lambda_ssim) * l1 + cfg.lambda_ssim * ds
        dmask = (cam.depth > 1e-4) & (res.alpha > 0.5)
        dl1 = losses.l1_masked(res.depth, cam.depth, dmask)
        return (photo + cfg.lambda_depth * dl1
                + cfg.lambda_opacity_ent
                * losses.opacity_entropy_loss(res.alpha)), \
            losses.psnr(res.rgb, cam.rgb)

    def loss_fn(params, static_map, decoders, local_idx, cams, sdf_batch):
        per_cam, psnrs = jax.vmap(
            lambda c: cam_loss(params, static_map, decoders, local_idx, c)
        )(cams)
        gs_loss = jnp.mean(per_cam)
        # concurrent SDF supervision (replicated batch)
        m, d = apply_gs_params(static_map, decoders, params)
        pts_b, sdf_lab, col_lab, w_b, valid_b = sdf_batch[:5]
        sdf_p, _, qv = field.sdf_at(m, d, pts_b, sigma_scale,
                                    cfg.query_nn_k, cfg.num_nei_cells,
                                    cfg.search_alpha)
        vb = (valid_b & qv).astype(jnp.float32)
        bce = losses.sdf_bce_loss(sdf_p, sdf_lab, w_b, sigma, vb)
        return gs_loss + bce, jnp.mean(psnrs)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, static_map, decoders, local_idx, cams,
             sdf_batch):
        cams = jax.lax.with_sharding_constraint(cams, batch_shard)
        (_, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, static_map, decoders, local_idx, cams, sdf_batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, psnr

    return step
