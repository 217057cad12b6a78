"""Mapper fidelity behaviors: Gaussian invalidation, adaptive iterations,
robot-stop throttling, and the frozen surrounding-Gaussian background.

Reference behaviors: check_invalid_neural_points (utils/mapper.py:1636-1655),
new-observation-ratio adaptive iters (mapper.py:447-513), robot-stop
detection (slam_dataset.py:709-721), surrounding background spawn
(mapper.py:1039-1052)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pings_tpu.config import Config
from pings_tpu.mapping import gs_mapper, pool as rp, sdf_mapper
from pings_tpu.mapping.campool import CamPool
from pings_tpu.mapping.sampler import sample_rays
from pings_tpu.models import decoder as dec, field, neural_points as npm
from pings_tpu.models.renderer import CamView
from pings_tpu.models.spawn import empty_spawned

from tests.test_gs_mapping import (
    CENTER, H, KMAT, RADIUS, W, raycast_target, sphere_color)


def small_cfg(**kw):
    base = dict(
        max_points=8192, buffer_size=1 << 16, voxel_size_m=0.2,
        feature_dim=8, color_feature_dim=8, bs=512,
        geo_mlp_hidden_dim=32, color_mlp_hidden_dim=32,
        gaussian_mlp_hidden_dim=32, pool_capacity=1 << 14,
        lr=0.02, lr_mlp_base=2e-3, spawn_n_gaussian=4,
        gs_sdf_sample_count=128, max_gs_per_tile=256, tile_size=16,
        max_range=20.0, max_surrounding_points=256,
    )
    base.update(kw)
    return Config.load(overrides=base)


def _trained_sphere_map(cfg, rng, iters=120):
    _, _, _, pts_w, origin = raycast_target()
    sub = rng.choice(len(pts_w), size=min(2000, len(pts_w)), replace=False)
    scan = pts_w[sub]
    scan_rgb = sphere_color(scan).astype(np.float32)
    m = npm.init_map(cfg)
    decoders = dec.init_decoders(jax.random.PRNGKey(0), cfg)
    m = npm.insert_points(
        m, jnp.asarray(scan), jnp.asarray(scan_rgb),
        jnp.ones(len(scan), bool),
        jnp.tile(jnp.array([1.0, 0, 0, 0]), (len(scan), 1)),
        jnp.int32(0), jnp.zeros(8), jnp.float32(1e9))
    pool = rp.init_pool(cfg.pool_capacity)
    s = sample_rays(jax.random.PRNGKey(1), jnp.asarray(scan),
                    jnp.asarray(scan_rgb), jnp.ones(len(scan), bool),
                    jnp.asarray(origin, jnp.float32))
    pool = rp.pool_insert(pool, s, jnp.int32(0), jax.random.PRNGKey(2))
    sopt, sparams, sstate = sdf_mapper.init_sdf_train(m, decoders, cfg)
    sstep = sdf_mapper.make_sdf_step(cfg, sopt)
    for i in range(iters):
        b = rp.pool_batch(pool, jax.random.PRNGKey(1000 + i), cfg.bs, 128)
        sparams, sstate, _ = sstep(sparams, sstate, b, m, decoders,
                                   jnp.asarray(False))
    m, decoders = sdf_mapper.apply_sdf_params(m, decoders, sparams)
    return m, decoders, pool, origin


@pytest.mark.slow
def test_check_invalid_gs_invalidates_freespace_points(rng):
    cfg = small_cfg()
    m, decoders, _, origin = _trained_sphere_map(cfg, rng)
    n0 = int(m.count)

    # plant an outlier neural point in trained free space (between the
    # sensor origin and the sphere surface along +z)
    outlier = np.array([[0.0, 0.0, 0.5 * (CENTER[2] - RADIUS)]], np.float32)
    m = npm.insert_points(
        m, jnp.asarray(outlier), jnp.zeros((1, 3)), jnp.ones(1, bool),
        jnp.array([[1.0, 0, 0, 0]]), jnp.int32(1), jnp.zeros(8),
        jnp.float32(1e9))
    assert int(m.count) == n0 + 1
    out_row = n0  # appended at the tail

    # everyone is "stable"
    m = m.replace(certainty=jnp.full_like(m.certainty, 2.0))
    local_idx = jnp.nonzero(m.valid_mask, size=4096,
                            fill_value=m.capacity)[0]
    sig = cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m
    # reference gate: render_min_nn_count=6 (mapper.py:1643) — an isolated
    # free-space point fails the neighbor-count gate; near-surface points
    # with full neighborhoods keep their mask via |SDF| < thre
    m2 = field.check_invalid_gs(
        m, decoders, local_idx, sig, jnp.float32(1.0),
        jnp.float32(cfg.dynamic_sdf_ratio_thre * cfg.voxel_size_m),
        k=cfg.query_nn_k, stencil_r=cfg.num_nei_cells,
        search_alpha=cfg.search_alpha, min_nn=6)

    vm = np.asarray(m2.valid_gs_mask)
    assert not vm[out_row], "free-space outlier must be invalidated"
    surf = vm[:n0]
    assert surf.mean() > 0.8, f"surface points wrongly invalidated: {surf.mean()}"


def test_adaptive_offset_thresholds():
    from pings_tpu.slam.pipeline import SlamSystem
    cfg = small_cfg(max_points=1 << 10, buffer_size=1 << 12,
                    pool_capacity=1 << 10, gs_on=False, track_on=False)
    sys_ = SlamSystem(cfg)
    cases = [
        (0.01, 10, -5),    # little new info -> train less
        (0.05, 10, 0),     # normal
        (0.2, 10, 5),      # much new -> train more
        (0.5, 10, 5),      # before freeze: restart tier inactive
        (0.5, cfg.freeze_after_frame + 1, 10),  # restart tier
    ]
    for ratio, fid, want in cases:
        sys_.new_obs_ratio = ratio
        assert sys_._adaptive_offset(fid) == want, (ratio, fid)
    # disabled flag kills the offset
    cfg2 = small_cfg(max_points=1 << 10, buffer_size=1 << 12,
                     pool_capacity=1 << 10, gs_on=False, track_on=False,
                     adaptive_iters=False)
    sys2 = SlamSystem(cfg2)
    sys2.new_obs_ratio = 0.5
    assert sys2._adaptive_offset(100) == 0


@pytest.mark.slow
def test_robot_stop_detection_throttles_updates(rng):
    from pings_tpu.slam.pipeline import SlamSystem
    cfg = small_cfg(max_points=1 << 14, buffer_size=1 << 16,
                    gs_on=False, track_on=False, mapping_iters=1,
                    init_iter_ratio=1, stop_frame_thre=2,
                    min_range=0.5, vox_down_m=0.1)
    # a stationary robot: identical scans, identical poses
    _, _, _, pts_w, origin = raycast_target()
    sub = rng.choice(len(pts_w), size=1500, replace=False)
    frame = {
        "points": pts_w[sub],
        "gt_pose": np.eye(4),
    }
    sys_ = SlamSystem(cfg)
    counts = []
    for fid in range(8):
        sys_.process_frame(dict(frame))
        counts.append(int(sys_.m.count))
    assert sys_.stop_status, "stationary robot must be detected"
    # frames 0-4 always update; after stop_status the map stops growing
    assert counts[-1] == counts[-2] == counts[-3], counts


@pytest.mark.slow
def test_surrounding_background_step_equivalence(rng):
    """An all-invalid surrounding buffer must not change training; the step
    must also accept a populated buffer (shape-stable path)."""
    cfg = small_cfg()
    m, decoders, pool, origin = _trained_sphere_map(cfg, rng, iters=30)
    rgb_t, depth_t, hit, _, _ = raycast_target()
    cam = CamView(K=jnp.asarray(KMAT), T_c_w=jnp.eye(4),
                  rgb=jnp.asarray(rgb_t), depth=jnp.asarray(depth_t),
                  sky=jnp.zeros((H, W)), frame_id=jnp.int32(0))
    cpool = CamPool(cfg)
    exposure, cam_delta = cpool.init_param_pools()
    slot = cpool.add_keyframe(cam, origin, 0)
    L = 1024
    local_idx = jnp.nonzero(m.valid_mask, size=L, fill_value=m.capacity)[0]
    opt = gs_mapper.make_gs_optimizer(cfg)
    step = gs_mapper.make_gsdf_step(cfg, opt, W, H, L)
    batch = rp.pool_batch(pool, jax.random.PRNGKey(7), cfg.bs, 128)

    # the step donates (params, opt_state): hand it deep copies so the
    # shared map/decoder buffers survive both calls
    fresh = lambda: jax.tree.map(
        jnp.copy, gs_mapper.gs_params(m, decoders, exposure, cam_delta))
    params0 = fresh()
    state0 = opt.init(params0)
    pA, _, metA, _ = step(params0, state0, m, decoders, local_idx, cam,
                       jnp.int32(slot), batch, jnp.asarray(False))

    params1 = fresh()
    state1 = opt.init(params1)
    sur = empty_spawned(cfg.max_surrounding_points * cfg.spawn_n_gaussian)
    pB, _, metB, _ = step(params1, state1, m, decoders, local_idx, cam,
                       jnp.int32(slot), batch, jnp.asarray(False),
                       surrounding=sur)
    assert np.isfinite(float(metB.total))
    np.testing.assert_allclose(float(metA.psnr), float(metB.psnr),
                               rtol=1e-4)
    a = jax.tree_util.tree_leaves(pA)
    b = jax.tree_util.tree_leaves(pB)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=2e-5)
