"""Surfel / 2DGS rasterizer modes: geometry and gradient checks.

Reference rasterizers: diff-gaussian-surfel-rasterization-w-pose (per-pixel
plane depth, normals; gaussian_renderer/__init__.py:313-347) and
diff-surfel-rasterization (2DGS ray-disc intersection with median depth and
distortion map, __init__.py:349-409)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pings_tpu.ops import rasterize as rz

W, H = 64, 48
K = jnp.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1.0]])
T_IDENT = jnp.eye(4)


def tilted_splat(tilt_deg=30.0, z0=3.0, opa=0.99):
    """One flat splat at (0,0,z0), tilted about the x axis."""
    a = np.deg2rad(tilt_deg) / 2.0
    quat = np.array([np.cos(a), np.sin(a), 0.0, 0.0], np.float32)  # about x
    means = jnp.array([[0.0, 0.0, z0]])
    quats = jnp.asarray(quat)[None]
    scales = jnp.array([[0.8, 0.8, 1e-4]])
    opas = jnp.array([opa])
    cols = jnp.array([[0.9, 0.2, 0.1]])
    valid = jnp.ones(1, bool)
    return means, quats, scales, opas, cols, valid


def analytic_plane_depth(tilt_deg, z0):
    """Per-pixel ray depth of the tilted plane through (0,0,z0)."""
    a = np.deg2rad(tilt_deg)
    # rotation about x of the local z axis
    n = np.array([0.0, -np.sin(a), np.cos(a)])
    if n[2] > 0:
        n = -n
    p = np.array([0.0, 0.0, z0])
    ys, xs = np.mgrid[0:H, 0:W]
    d = np.stack([(xs + 0.5 - 32.0) / 60.0, (ys + 0.5 - 24.0) / 60.0,
                  np.ones_like(xs, np.float64)], -1)
    return (n @ p) / (d @ n)


@pytest.mark.parametrize("mode", ["surfel", "2dgs"])
def test_perpixel_plane_depth(mode):
    scene = tilted_splat()
    out = rz.rasterize(*scene, T_IDENT, K, W, H, mode=mode,
                       max_per_tile=32, chunk=8)
    z_true = analytic_plane_depth(30.0, 3.0)
    a = np.asarray(out.alpha)
    core = a > 0.5
    assert core.sum() > 100
    got = np.asarray(out.depth)[core]
    np.testing.assert_allclose(got, z_true[core], rtol=2e-3)
    # the blended normal matches the (camera-facing) plane normal
    aa = np.deg2rad(30.0)
    n_true = np.array([0.0, np.sin(aa), -np.cos(aa)])
    nrm = np.asarray(out.normal)[core] / a[core][:, None]
    np.testing.assert_allclose(nrm, np.broadcast_to(n_true, nrm.shape),
                               atol=5e-3)


def test_2dgs_median_depth_and_distortion():
    scene = tilted_splat(tilt_deg=0.0)
    out = rz.rasterize(*scene, T_IDENT, K, W, H, mode="2dgs",
                       max_per_tile=32, chunk=8)
    a = np.asarray(out.alpha)
    core = a > 0.6
    # single splat: median depth = splat depth, distortion ~ 0
    np.testing.assert_allclose(np.asarray(out.depth_median)[core], 3.0,
                               rtol=2e-3)
    assert float(np.abs(np.asarray(out.distortion)[core]).max()) < 1e-6

    # a second parallel splat behind: distortion turns on in the overlap
    means = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 4.0]])
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
    scales = jnp.array([[0.8, 0.8, 1e-4], [1.0, 1.0, 1e-4]])
    opas = jnp.array([0.6, 0.9])
    cols = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
    out2 = rz.rasterize(means, quats, scales, opas, cols,
                        jnp.ones(2, bool), T_IDENT, K, W, H, mode="2dgs",
                        max_per_tile=32, chunk=8)
    d2 = np.asarray(out2.distortion)
    assert d2[24, 32] > 1e-4, d2[24, 32]
    # median still reports the front surface at the center
    assert abs(float(out2.depth_median[24, 32]) - 3.0) < 0.02


def make_scene(rng, n=10):
    means = np.stack([
        rng.uniform(-1.2, 1.2, n), rng.uniform(-1.0, 1.0, n),
        rng.uniform(2.0, 6.0, n)], -1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = rng.uniform(0.1, 0.4, (n, 3)).astype(np.float32)
    opa = rng.uniform(0.3, 0.9, n).astype(np.float32)
    col = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in
                 (means, quats, scales, opa, col, np.ones(n, bool)))


@pytest.mark.parametrize("mode", ["surfel", "2dgs"])
def test_param_grads_match_fd(rng, mode):
    """FD check in a smooth regime (large cutoff, no alpha floor)."""
    scene = make_scene(rng)
    means, quats, scales, opa, col, valid = scene
    smooth = dict(cutoff_q=40.0, alpha_floor=0.0, normalize_depth=False)

    def f(p):
        ms, sc, op = p
        out = rz.rasterize(ms, quats, sc, op, col, valid, T_IDENT, K,
                           W, H, mode=mode, max_per_tile=64, chunk=8,
                           **smooth)
        tgt = jnp.linspace(0, 1, H * W * 3).reshape(H, W, 3)
        loss = (jnp.mean((out.rgb - tgt) ** 2)
                + 0.01 * jnp.mean(out.depth * out.alpha)
                + 0.1 * jnp.mean(out.alpha)
                + 0.05 * jnp.mean(out.normal ** 2))
        if mode == "2dgs":
            loss = loss + 0.1 * jnp.mean(out.distortion)
        return loss

    params = (means, scales, opa)
    g = jax.grad(f)(params)
    for pi, name in enumerate(["means", "scales", "opa"]):
        arr = np.array(params[pi], np.float64)
        ga = np.array(g[pi])
        idxs = [(0,) * arr.ndim, (5,) + (0,) * (arr.ndim - 1)]
        for idx in idxs:
            eps = 1e-3
            ap = arr.copy(); ap[idx] += eps
            am = arr.copy(); am[idx] -= eps
            pp = list(params); pp[pi] = jnp.asarray(ap, jnp.float32)
            pm = list(params); pm[pi] = jnp.asarray(am, jnp.float32)
            fd = (float(f(tuple(pp))) - float(f(tuple(pm)))) / (2 * eps)
            got = float(ga[idx])
            assert abs(got - fd) < max(5e-2 * abs(fd), 5e-3), (
                mode, name, idx, got, fd)


def test_pose_grads_surfel(rng):
    scene = make_scene(rng)
    smooth = dict(cutoff_q=40.0, alpha_floor=0.0, normalize_depth=False)

    def f(tr):
        theta, rho_ = tr
        out = rz.rasterize(*scene, T_IDENT, K, W, H, mode="surfel",
                           theta=theta, rho=rho_, max_per_tile=64,
                           chunk=8, **smooth)
        return jnp.mean(out.rgb ** 2) + 0.01 * jnp.mean(out.alpha)

    z3 = jnp.zeros(3)
    gt, gr = jax.grad(f)((z3, z3))
    for pi, ga in [(0, np.array(gt)), (1, np.array(gr))]:
        for d in range(3):
            eps = 1e-4
            vp = [np.zeros(3), np.zeros(3)]
            vm = [np.zeros(3), np.zeros(3)]
            vp[pi][d] = eps
            vm[pi][d] = -eps
            fd = (float(f((jnp.asarray(vp[0], jnp.float32),
                           jnp.asarray(vp[1], jnp.float32))))
                  - float(f((jnp.asarray(vm[0], jnp.float32),
                             jnp.asarray(vm[1], jnp.float32))))) / (2 * eps)
            got = float(ga[d])
            assert abs(got - fd) < max(5e-2 * abs(fd), 5e-3), (pi, d, got, fd)


@pytest.mark.slow
@pytest.mark.parametrize("gs_type", ["gaussian_surfel", "2d_gs"])
def test_gsdf_step_runs_in_surfel_modes(rng, gs_type):
    """The fused GS+SDF step trains in surfel/2DGS modes (distortion and
    area losses active where applicable)."""
    from tests.test_mapper_fidelity import small_cfg, _trained_sphere_map
    from tests.test_gs_mapping import raycast_target, H as HH, W as WW, KMAT
    from pings_tpu.mapping import gs_mapper, pool as rp
    from pings_tpu.mapping.campool import CamPool
    from pings_tpu.models.renderer import CamView

    cfg = small_cfg(gs_type=gs_type, lambda_distortion=0.01,
                    lambda_area=0.001, lambda_isotropic=0.01)
    m, decoders, pool, origin = _trained_sphere_map(cfg, rng, iters=40)
    rgb_t, depth_t, hit, _, _ = raycast_target()
    cam = CamView(K=jnp.asarray(KMAT), T_c_w=jnp.eye(4),
                  rgb=jnp.asarray(rgb_t), depth=jnp.asarray(depth_t),
                  sky=jnp.zeros((HH, WW)), frame_id=jnp.int32(0))
    cpool = CamPool(cfg)
    exposure, cam_delta = cpool.init_param_pools()
    slot = cpool.add_keyframe(cam, origin, 0)
    L = 1024
    local_idx = jnp.nonzero(m.valid_mask, size=L, fill_value=m.capacity)[0]
    opt = gs_mapper.make_gs_optimizer(cfg)
    params = gs_mapper.gs_params(m, decoders, exposure, cam_delta)
    state = opt.init(params)
    step = gs_mapper.make_gsdf_step(cfg, opt, WW, HH, L)
    psnr0 = None
    for i in range(30):
        batch = rp.pool_batch(pool, jax.random.PRNGKey(i), cfg.bs, 128)
        params, state, met, _ = step(params, state, m, decoders, local_idx,
                                  cam, jnp.int32(slot), batch,
                                  jnp.asarray(False))
        if psnr0 is None:
            psnr0 = float(met.psnr)
    assert np.isfinite(float(met.total))
    assert float(met.psnr) > psnr0, (psnr0, float(met.psnr))
