"""Multi-device sharding correctness on the virtual 8-device CPU mesh.

The property that matters for a DP/sharded step is *numerical equivalence
with the single-device program* (VERDICT r1): sharding must change the
schedule, not the math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pings_tpu.config import Config
from pings_tpu.mapping import gs_mapper
from pings_tpu.mapping.campool import CamPool
from pings_tpu.models import decoder as dec, neural_points as npm
from pings_tpu.models.renderer import CamView, render
from pings_tpu.models.spawn import gather_local_data
from pings_tpu.ops import rasterize as rz
from pings_tpu.parallel.mesh import (
    make_dp_train_step, make_mesh, render_gauss_sharded, render_sharded)

W, H = 128, 64


def tiny_cfg(**kw):
    base = dict(
        max_points=4096, buffer_size=1 << 14, voxel_size_m=0.3,
        feature_dim=8, color_feature_dim=8, bs=256,
        geo_mlp_hidden_dim=32, color_mlp_hidden_dim=32,
        gaussian_mlp_hidden_dim=32, pool_capacity=1 << 12,
        spawn_n_gaussian=4, gs_sdf_sample_count=64,
        max_gs_per_tile=128, tile_size=16, max_local_points=1024,
        min_range=0.5, max_range=25.0)
    base.update(kw)
    return Config.load(overrides=base)


@pytest.fixture(scope="module")
def world():
    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    n = 1500
    pts = np.stack([rng.uniform(-5, 5, n), rng.uniform(-4, 4, n),
                    rng.uniform(2, 10, n)], -1).astype(np.float32)
    m = npm.init_map(cfg, jax.random.PRNGKey(0))
    decoders = dec.init_decoders(jax.random.PRNGKey(1), cfg)
    m = npm.insert_points(
        m, jnp.asarray(pts), jnp.asarray(rng.random((n, 3)), jnp.float32),
        jnp.ones(n, bool), jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        jnp.int32(0), jnp.zeros(16), jnp.float32(1e9))
    K = jnp.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1.0]])
    cam = CamView(K=K, T_c_w=jnp.eye(4),
                  rgb=jnp.asarray(rng.random((H, W, 3)), jnp.float32),
                  depth=jnp.asarray(rng.random((H, W)) * 5, jnp.float32),
                  sky=jnp.zeros((H, W)), frame_id=jnp.int32(0))
    return cfg, m, decoders, cam, rng


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, (
        "conftest must force an 8-device CPU mesh")


def test_tile_sharded_render_matches_unsharded(world):
    cfg, m, decoders, cam, rng = world
    n = 1024
    r2 = np.random.default_rng(1)
    means = jnp.asarray(np.stack([
        r2.uniform(-4, 4, n), r2.uniform(-3, 3, n), r2.uniform(2, 9, n)],
        -1), jnp.float32)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    scales = jnp.full((n, 3), 0.1)
    opas = jnp.full((n,), 0.7)
    cols = jnp.asarray(r2.random((n, 3)), jnp.float32)
    valid = jnp.ones(n, bool)

    ref = rz.rasterize(means, quats, scales, opas, cols, valid,
                       jnp.eye(4), cam.K, W, H, max_per_tile=128)
    mesh = make_mesh(8)
    out = render_sharded(mesh, means, quats, scales, opas, cols, valid,
                         jnp.eye(4), cam.K, W, H, max_per_tile=128)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.alpha),
                               np.asarray(ref.alpha), atol=1e-5)


def test_gauss_sharded_render_matches_unsharded(world):
    cfg, m, decoders, cam, rng = world
    L = 1024  # divisible by 8
    local = gather_local_data(m, m.valid_mask, L)
    spawn_kwargs = dict(spawn_k=cfg.spawn_n_gaussian,
                        voxel_size=cfg.voxel_size_m,
                        max_range=cfg.max_range)
    ref = render(local, decoders, cam, W, H, spawn_kwargs=spawn_kwargs,
                 tile=16, max_per_tile=128)
    mesh = make_mesh(8)
    with mesh:
        out = render_gauss_sharded(mesh, local, decoders, cam, W, H,
                                   spawn_kwargs=spawn_kwargs,
                                   max_per_tile=128)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.depth),
                               np.asarray(ref.depth), atol=2e-4)


@pytest.mark.parametrize("mode", ["3dgs", "surfel"])
def test_tile_sharded_pallas_blend_interpret_matches_single(world, mode,
                                                            monkeypatch):
    """The tile0-offset Pallas kernel + shard_map AD psum, executed.

    Runs ``blend_gaussians_tile_sharded`` on the 8-device CPU mesh with
    the kernels in interpreter mode and asserts forward AND backward
    equality with the single-device interpreted kernel (VERDICT r4
    item 4: this code path had never executed anywhere)."""
    from pings_tpu.ops import raster_pallas as rp

    monkeypatch.setattr(rp, "INTERPRET", True)
    cfg, m, decoders, cam, rng = world
    n = 512
    r2 = np.random.default_rng(3)
    means = jnp.asarray(np.stack([
        r2.uniform(-4, 4, n), r2.uniform(-3, 3, n), r2.uniform(2, 9, n)],
        -1), jnp.float32)
    quats = jnp.asarray(r2.normal(size=(n, 4)), jnp.float32)
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    scales = jnp.asarray(r2.uniform(0.05, 0.2, (n, 3)), jnp.float32)
    if mode == "surfel":
        scales = scales.at[:, 2].set(1e-7)
    opas = jnp.asarray(r2.uniform(0.3, 0.9, n), jnp.float32)
    cols = jnp.asarray(r2.random((n, 3)), jnp.float32)
    valid = jnp.ones(n, bool)

    tile, sup = 16, 128
    ntx, nty = W // tile, H // tile
    if mode == "surfel":
        ps = rz.project_surfels(means, quats, scales, opas, cols, valid,
                                jnp.eye(4), cam.K, W, H, mode="surfel")
        base = jax.tree.map(jax.lax.stop_gradient, ps.base)
        attr16 = rp.surfel_attr_matrix(ps, cam.K)
    else:
        p = rz.project_gaussians(means, quats, scales, opas, cols, valid,
                                 jnp.eye(4), cam.K, W, H)
        base = jax.tree.map(jax.lax.stop_gradient, p)
        attr16 = rp.gauss_attr_matrix(p)
    bins = rz.bin_gaussians(base, W, H, tile=tile, max_per_tile=128)

    mesh = make_mesh(8, axis="tile")

    def single(a16):
        return rp._blend_gaussians(a16, bins, None, ntx, nty, tile, sup,
                                   mode, False)

    def sharded(a16):
        return rp.blend_gaussians_tile_sharded(
            mesh, "tile", a16, bins, W, H, tile=tile, superblock=sup,
            mode=mode)

    out_s, trans_s, med_s = single(attr16)
    with mesh:
        out_m, trans_m, med_m = sharded(attr16)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(trans_m), np.asarray(trans_s),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(med_m), np.asarray(med_s),
                               atol=1e-6)
    assert float(jnp.max(jnp.abs(out_s))) > 0, "degenerate scene"

    # backward: cotangents on out AND trans so both grad paths (incl. the
    # shard_map psum of the replicated attr16 gradient) are exercised
    wo = jnp.asarray(r2.random(out_s.shape), jnp.float32)
    wt = jnp.asarray(r2.random(trans_s.shape), jnp.float32)

    def loss(a16, f):
        o, t, _ = f(a16)
        return jnp.sum(o * wo) + jnp.sum(t * wt)

    g_single = jax.grad(loss)(attr16, single)
    with mesh:
        g_shard = jax.grad(loss)(attr16, sharded)
    np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_single),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.max(jnp.abs(g_single))) > 0, "zero gradient"


def _run_dp(world, n_devices, n_cams=8):
    """One DP step on an n-device mesh over the same 8-camera batch."""
    cfg, m, decoders, cam, _ = world
    mesh = make_mesh(n_devices)
    cpool = CamPool(cfg)
    exposure, cam_delta = cpool.init_param_pools()
    opt = gs_mapper.make_gs_optimizer(cfg)
    params = jax.tree.map(
        jnp.copy, gs_mapper.gs_params(m, decoders, exposure, cam_delta))
    state = opt.init(params)
    rng = np.random.default_rng(7)
    cams = jax.tree.map(lambda x: jnp.stack([x] * n_cams), cam)
    # distinct targets per camera so the mean-gradient actually mixes
    cams = cams._replace(rgb=jnp.asarray(
        rng.random((n_cams, H, W, 3)), jnp.float32))
    local_idx = jnp.nonzero(m.valid_mask, size=cfg.max_local_points,
                            fill_value=m.capacity)[0]
    sdf_batch = (
        jnp.asarray(rng.random((cfg.bs, 3)) * 8, jnp.float32),
        jnp.zeros(cfg.bs), jnp.zeros((cfg.bs, 3)), jnp.ones(cfg.bs),
        jnp.ones(cfg.bs, bool))
    step = make_dp_train_step(cfg, opt, mesh, W, H, cfg.max_local_points)
    cam_slots = jnp.arange(n_cams, dtype=jnp.int32) % exposure.a.shape[0]
    with mesh:
        params, state, mets = step(params, state, m, decoders, local_idx,
                                   cams, cam_slots, sdf_batch,
                                   jnp.asarray(False))
    return jax.tree.map(np.asarray, params), float(mets.psnr)


@pytest.mark.slow
def test_dp_step_matches_single_device(world):
    """8-device DP step == 1-device step on the identical batch."""
    p8, psnr8 = _run_dp(world, 8)
    p1, psnr1 = _run_dp(world, 1)
    assert np.isfinite(psnr8)
    np.testing.assert_allclose(psnr8, psnr1, rtol=1e-4)
    flat8 = jax.tree_util.tree_leaves(p8)
    flat1 = jax.tree_util.tree_leaves(p1)
    for a, b in zip(flat8, flat1):
        np.testing.assert_allclose(a, b, atol=3e-6)


def test_gauss_sharded_train_step_matches_single_device(world):
    """Model-parallel training (spawn sharded over points, bwd through
    the shard_map all-gather) must match the 1-device step numerically."""
    from pings_tpu.parallel.mesh import make_gauss_sharded_train_step

    cfg, m, decoders, cam, rng = world
    cpool = CamPool(cfg)
    exposure, cam_delta = cpool.init_param_pools()
    opt = gs_mapper.make_gs_optimizer(cfg)
    local_idx = jnp.nonzero(m.valid_mask, size=cfg.max_local_points,
                            fill_value=m.capacity)[0]

    def run(nd):
        mesh = make_mesh(nd)
        step = make_gauss_sharded_train_step(cfg, opt, mesh, W, H,
                                             cfg.max_local_points)
        params = jax.tree.map(jnp.copy, gs_mapper.gs_params(
            m, decoders, exposure, cam_delta))
        state = opt.init(params)
        with mesh:
            params, _, psnr = step(params, state, m, decoders, local_idx,
                                   cam)
            jax.block_until_ready(psnr)
        return params, float(psnr)

    p8, psnr8 = run(8)
    p1, psnr1 = run(1)
    assert np.isfinite(psnr8)
    assert abs(psnr8 - psnr1) < 1e-3 * max(1.0, abs(psnr1))
    for a, b in zip(jax.tree_util.tree_leaves(p8),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6)
