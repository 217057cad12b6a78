"""End-to-end joint GS+SDF mapping on a synthetic colored sphere.

This is the 'minimum end-to-end slice' of SURVEY.md §7.2-4: neural point
map + decoders trained jointly (photometric + SDF) and rendered."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pings_tpu.config import Config
from pings_tpu.mapping import gs_mapper, pool as rp
from pings_tpu.mapping.campool import CamPool
from pings_tpu.mapping.sampler import sample_rays
from pings_tpu.models import decoder as dec, neural_points as npm
from pings_tpu.models.renderer import CamView
from pings_tpu.models.spawn import gather_local_data, spawn_gaussians

W, H = 80, 60
KMAT = np.array([[70.0, 0, 40], [0, 70.0, 30], [0, 0, 1]], np.float32)
CENTER = np.array([0.0, 0.0, 4.0])  # sphere in front of the camera (+z)
RADIUS = 1.5


def sphere_color(p):
    """Position-based albedo: smooth RGB from surface normal."""
    n = (p - CENTER) / RADIUS
    return 0.5 + 0.45 * n


def raycast_target(T_c_w=np.eye(4)):
    """Render the analytic sphere: rgb, depth, hit mask + LiDAR-like points."""
    T_w_c = np.linalg.inv(T_c_w)
    origin = T_w_c[:3, 3]
    ys, xs = np.mgrid[0:H, 0:W]
    d_cam = np.stack([
        (xs + 0.5 - KMAT[0, 2]) / KMAT[0, 0],
        (ys + 0.5 - KMAT[1, 2]) / KMAT[1, 1],
        np.ones_like(xs, np.float32),
    ], -1)
    d_world = d_cam @ T_w_c[:3, :3].T
    dn = d_world / np.linalg.norm(d_world, axis=-1, keepdims=True)
    oc = origin - CENTER
    b = dn @ oc
    c = oc @ oc - RADIUS**2
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit = (disc > 0) & (t > 0.1)
    pts = origin + dn * t[..., None]
    rgb = np.where(hit[..., None], sphere_color(pts), 0.0).astype(np.float32)
    zdepth = (t * (d_cam[..., 2] / np.linalg.norm(d_cam, axis=-1)))
    depth = np.where(hit, zdepth, 0.0).astype(np.float32)
    return rgb, depth, hit, pts[hit].astype(np.float32), origin


@pytest.mark.slow
def test_gsdf_slice_converges(rng):
    cfg = Config.load(overrides=dict(
        max_points=8192, buffer_size=1 << 16, voxel_size_m=0.2,
        feature_dim=8, color_feature_dim=8, bs=512,
        geo_mlp_hidden_dim=32, color_mlp_hidden_dim=32,
        gaussian_mlp_hidden_dim=32,
        pool_capacity=1 << 14, lr=0.02, lr_mlp_base=2e-3,
        spawn_n_gaussian=4, gs_sdf_sample_count=128,
        max_gs_per_tile=256, tile_size=16,
        gradient_decimation=10, sky_on=False, lambda_isotropic=0.0,
        max_range=20.0,
    ))
    rgb_t, depth_t, hit, pts_w, origin = raycast_target()
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
    n_pts = int(m.count)
    assert n_pts > 150

    pool = rp.init_pool(cfg.pool_capacity)
    s = sample_rays(jax.random.PRNGKey(1), jnp.asarray(scan),
                    jnp.asarray(scan_rgb), jnp.ones(len(scan), bool),
                    jnp.asarray(origin, jnp.float32))
    pool = rp.pool_insert(pool, s, jnp.int32(0), jax.random.PRNGKey(2))

    cam = CamView(
        K=jnp.asarray(KMAT), T_c_w=jnp.eye(4),
        rgb=jnp.asarray(rgb_t), depth=jnp.asarray(depth_t),
        sky=jnp.zeros((H, W)), frame_id=jnp.int32(0))
    cpool = CamPool(cfg)
    exposure, cam_delta = cpool.init_param_pools()
    slot = cpool.add_keyframe(cam, origin, 0)

    # first-frame SDF-only pre-training (reference init_iter_ratio,
    # pings.py:339)
    from pings_tpu.mapping import sdf_mapper
    sopt, sparams, sstate = sdf_mapper.init_sdf_train(m, decoders, cfg)
    sstep = sdf_mapper.make_sdf_step(cfg, sopt)
    for i in range(120):
        b = rp.pool_batch(pool, jax.random.PRNGKey(1000 + i), cfg.bs, 128)
        sparams, sstate, _ = sstep(sparams, sstate, b, m, decoders,
                                   jnp.asarray(False))
    m, decoders = sdf_mapper.apply_sdf_params(m, decoders, sparams)

    L = 1024
    local_idx = jnp.nonzero(m.valid_mask, size=L, fill_value=m.capacity)[0]

    opt = gs_mapper.make_gs_optimizer(cfg)
    params = gs_mapper.gs_params(m, decoders, exposure, cam_delta)
    opt_state = opt.init(params)
    step = gs_mapper.make_gsdf_step(cfg, opt, W, H, L)

    psnrs = []
    for i in range(150):
        sdf_batch = rp.pool_batch(pool, jax.random.PRNGKey(100 + i),
                                  cfg.bs, 128)
        params, opt_state, met, _ = step(
            params, opt_state, m, decoders, local_idx, cam,
            jnp.int32(slot), sdf_batch, jnp.asarray(False))
        if i % 25 == 0 or i == 149:
            psnrs.append(float(met.psnr))
    assert np.isfinite(psnrs).all(), psnrs
    assert psnrs[-1] > psnrs[0] + 4.0, psnrs
    assert psnrs[-1] > 18.0, psnrs
    assert float(met.depth_l1) < 0.2, float(met.depth_l1)
    # concurrent SDF supervision trains slower under the joint loss; check
    # it is descending and the field sign is right rather than a hard floor
    assert float(met.sdf_bce) < 0.69

    m2, d2 = gs_mapper.apply_gs_params(m, decoders, params)
    from pings_tpu.models import field
    sig = cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m
    surf = np.array([0.0, 0.0, 4.0 - RADIUS])  # nearest surface point
    probes = jnp.asarray(np.stack([surf, surf - [0, 0, 0.15],
                                   surf + [0, 0, 0.15]]), jnp.float32)
    sdf_v, _, val_v = field.sdf_at(m2, d2, probes, sig, k=cfg.query_nn_k)
    assert bool(val_v.all())
    assert float(sdf_v[1]) > float(sdf_v[0]) > float(sdf_v[2])

    # render through the public path (in the trained gs_type!) and
    # check alpha covers the sphere
    from pings_tpu.models.renderer import render
    from pings_tpu.models.spawn import spawn_kwargs_from_cfg
    local = gather_local_data(m2, m2.valid_mask, L)
    res = render(local, d2, cam, W, H,
                 spawn_kwargs=spawn_kwargs_from_cfg(cfg),
                 max_per_tile=256, gs_type=cfg.gs_type)
    a = np.array(res.alpha)
    assert a[hit].mean() > 0.6, a[hit].mean()
    assert a[~hit].mean() < 0.2, a[~hit].mean()


def test_recycled_keyframe_slot_resets_trainables(rng):
    """When the camera pool wraps, the recycled slot must start from
    identity exposure / zero pose delta with zeroed Adam moments — not the
    previous occupant's trained values (VERDICT r2: slot-recycling bug)."""
    cfg = Config.load(overrides=dict(
        max_points=512, buffer_size=1 << 12, feature_dim=4,
        color_feature_dim=4, geo_mlp_hidden_dim=16, color_mlp_hidden_dim=16,
        gaussian_mlp_hidden_dim=16, img_pool_size=2, long_term_pool_size=2,
    ))
    m = npm.init_map(cfg, jax.random.PRNGKey(0))
    decoders = dec.init_decoders(jax.random.PRNGKey(1), cfg)
    pool = CamPool(cfg)
    exposure, cam_delta = pool.init_param_pools()
    opt = gs_mapper.make_gs_optimizer(cfg)
    params = gs_mapper.gs_params(m, decoders, exposure, cam_delta)
    state = opt.init(params)

    # dirty every slot's trainables + moments (as if trained)
    e = params["exposure"]
    params["exposure"] = e._replace(a=e.a + 0.7, off=e.off + 0.3,
                                    mat=e.mat + 0.1)
    params["cam_delta"] = params["cam_delta"] + 0.05
    dirty = lambda x: (x + 1.0 if hasattr(x, "ndim") and x.ndim >= 1
                       else x)
    inner = dict(state.inner_states)
    for lbl in ("exposure", "cam_delta"):
        inner[lbl] = jax.tree.map(dirty, inner[lbl])
    state = state._replace(inner_states=inner)

    # pool wraps: fill all slots, then one more recycles
    cam = CamView(K=jnp.eye(3), T_c_w=jnp.eye(4),
                  rgb=jnp.zeros((4, 4, 3)), depth=jnp.zeros((4, 4)),
                  sky=jnp.zeros((4, 4)), frame_id=jnp.int32(0))
    slots = [pool.add_keyframe(cam, np.array([float(i), 0, 0]), i)
             for i in range(pool.n_slots + 1)]
    recycled = slots[-1]
    assert recycled in slots[:-1]  # the pool really wrapped

    params2, state2 = gs_mapper.reset_keyframe_slot(params, state, recycled)
    e2 = params2["exposure"]
    np.testing.assert_allclose(np.asarray(e2.mat[recycled]), np.eye(3))
    np.testing.assert_allclose(np.asarray(e2.off[recycled]), 0.0)
    assert float(e2.a[recycled]) == 0.0 and float(e2.b[recycled]) == 0.0
    np.testing.assert_allclose(np.asarray(params2["cam_delta"][recycled]),
                               0.0)
    # other slots untouched
    other = next(s for s in slots[:-1] if s != recycled)
    assert float(e2.a[other]) == pytest.approx(0.7)
    # moments of the slot zeroed, others kept
    mu_e = state2.inner_states["exposure"][0][0].mu["exposure"]
    assert float(mu_e.a[recycled]) == 0.0
    assert float(mu_e.a[other]) == 1.0
    mu_cd = state2.inner_states["cam_delta"][0][0].mu["cam_delta"]
    np.testing.assert_allclose(np.asarray(mu_cd[recycled]), 0.0)
