import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pings_tpu.ops import rasterize as rz
from pings_tpu.ops.rasterize_ref import rasterize_ref

W, H = 64, 48
K = jnp.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1.0]])
T_IDENT = jnp.eye(4)


def make_scene(rng, n=64, seed_depth=3.0):
    means = np.stack([
        rng.uniform(-1.5, 1.5, n),
        rng.uniform(-1.2, 1.2, n),
        rng.uniform(2.0, 6.0, n),
    ], axis=-1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = rng.uniform(0.05, 0.25, (n, 3)).astype(np.float32)
    opa = rng.uniform(0.3, 0.95, n).astype(np.float32)
    col = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    valid = np.ones(n, bool)
    return tuple(jnp.asarray(x) for x in (means, quats, scales, opa, col, valid))


@pytest.fixture
def scene(rng):
    return make_scene(rng)


class TestForwardParity:
    def test_tiled_matches_naive(self, scene):
        out_t = rz.rasterize(*scene, T_IDENT, K, W, H, tile=16,
                             max_span=64, max_per_tile=128, chunk=16,
                             with_contrib=True)
        out_r = rasterize_ref(*scene, T_IDENT, K, W, H)
        assert int(out_t.n_overflow) == 0
        np.testing.assert_allclose(out_t.rgb, out_r.rgb, atol=2e-5)
        np.testing.assert_allclose(out_t.alpha, out_r.alpha, atol=2e-5)
        np.testing.assert_allclose(out_t.normal, out_r.normal, atol=2e-5)
        # depth only where alpha is meaningful
        m = np.array(out_r.alpha) > 1e-3
        np.testing.assert_allclose(np.array(out_t.depth)[m],
                                   np.array(out_r.depth)[m], atol=1e-4)
        np.testing.assert_allclose(out_t.contrib, out_r.contrib, atol=2e-5)

    def test_background_fills_empty(self, scene):
        bg = jnp.array([0.2, 0.4, 0.6])
        out = rz.rasterize(*scene, T_IDENT, K, W, H, bg=bg,
                           max_per_tile=128, chunk=16)
        a = np.array(out.alpha)
        rgb = np.array(out.rgb)
        empty = a < 1e-4
        assert empty.any()
        np.testing.assert_allclose(
            rgb[empty], np.broadcast_to(np.array(bg), rgb[empty].shape),
            atol=1e-3)

    def test_opaque_front_gaussian_wins(self, rng):
        # two gaussians on the optical axis; front one nearly opaque
        means = jnp.array([[0, 0, 2.0], [0, 0, 4.0]])
        quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
        scales = jnp.full((2, 3), 0.5)
        opa = jnp.array([0.99, 0.99])
        col = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
        valid = jnp.ones(2, bool)
        out = rz.rasterize(means, quats, scales, opa, col, valid,
                           T_IDENT, K, W, H, max_per_tile=32, chunk=8)
        center = np.array(out.rgb[24, 32])
        assert center[0] > 0.95 and center[1] < 0.05
        assert abs(float(out.depth[24, 32]) - 2.0) < 0.05

    def test_mark_visible(self):
        means = jnp.array([[0, 0, 3.0], [0, 0, -3.0], [100.0, 0, 3.0]])
        vis = rz.mark_visible(means, T_IDENT, K, W, H)
        assert bool(vis[0]) and not bool(vis[1]) and not bool(vis[2])

    def test_overflow_counted(self, rng):
        sc = make_scene(rng, n=256)
        out = rz.rasterize(*sc, T_IDENT, K, W, H, max_per_tile=8, chunk=8)
        assert int(out.n_overflow) > 0


class TestGradients:
    """FD comparisons run against the dense reference rasterizer in a
    smooth regime (large ellipse cutoff, no alpha floor, unnormalized
    depth): the production q<9 / 1-in-255 cutoffs are genuine
    discontinuities — present in the CUDA reference too — where AD and FD
    legitimately disagree at splat boundaries. Tiled-vs-reference AD
    equality (test_grads_match_reference_grads) transfers the FD evidence
    to the tiled implementation."""

    SMOOTH = dict(cutoff_q=40.0, alpha_floor=0.0, normalize_depth=False)

    def loss(self, params, scene, theta_rho=False):
        means, quats, scales, opa, col, valid = scene
        if theta_rho:
            theta, rho = params
            out = rasterize_ref(means, quats, scales, opa, col, valid,
                                T_IDENT, K, W, H, theta=theta, rho=rho,
                                **self.SMOOTH)
        else:
            out = rasterize_ref(*params, col, valid, T_IDENT, K, W, H,
                                **self.SMOOTH)
        tgt = jnp.linspace(0, 1, H * W * 3).reshape(H, W, 3)
        return (jnp.mean((out.rgb - tgt) ** 2)
                + 0.01 * jnp.mean(out.depth ** 2)
                + 0.1 * jnp.mean(out.alpha))

    def test_param_grads_match_fd(self, rng):
        scene = make_scene(rng, n=12)
        means, quats, scales, opa, col, valid = scene
        params = (means, quats, scales, opa)
        f = lambda p: self.loss(p, scene)
        g = jax.grad(f)(params)
        # finite differences on a few coordinates of each param
        for pi, name in enumerate(["means", "quats", "scales", "opa"]):
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
                assert abs(got - fd) < max(3e-2 * abs(fd), 3e-3), (
                    name, idx, got, fd)

    def test_pose_grads_match_fd(self, rng):
        scene = make_scene(rng, n=12)
        z3 = jnp.zeros(3)
        f = lambda p: self.loss(p, scene, theta_rho=True)
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
                assert abs(got - fd) < max(3e-2 * abs(fd), 3e-3), (
                    pi, d, got, fd)

    def test_grads_match_reference_grads(self, rng):
        scene = make_scene(rng, n=24)
        means, quats, scales, opa, col, valid = scene

        def loss_with(raster):
            def f(ms, sc, op, cl):
                out = raster(ms, quats, sc, op, cl, valid, T_IDENT, K, W, H)
                return jnp.mean(out.rgb ** 2) + jnp.mean(out.alpha)
            return f

        tiled = lambda *a, **k: rz.rasterize(*a, **k, max_per_tile=128,
                                             chunk=16)
        g_t = jax.grad(loss_with(tiled), argnums=(0, 1, 2, 3))(
            means, scales, opa, col)
        g_r = jax.grad(loss_with(rasterize_ref), argnums=(0, 1, 2, 3))(
            means, scales, opa, col)
        for a, b in zip(g_t, g_r):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)
