"""Pallas blend kernel vs the portable XLA rasterizer (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pings_tpu.ops import raster_pallas as rp
from pings_tpu.ops import rasterize as rz

rp.INTERPRET = True  # CPU test suite runs the kernels interpreted

W, H = 64, 48
K = jnp.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1.0]])
T_IDENT = jnp.eye(4)


def make_scene(rng, n=48):
    means = np.stack([
        rng.uniform(-1.5, 1.5, n), rng.uniform(-1.2, 1.2, n),
        rng.uniform(2.0, 6.0, n)], -1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = rng.uniform(0.05, 0.25, (n, 3)).astype(np.float32)
    opa = rng.uniform(0.3, 0.95, n).astype(np.float32)
    col = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in
                 (means, quats, scales, opa, col, np.ones(n, bool)))


COMMON = dict(tile=16, max_span=16, max_per_tile=128)


class TestPallasForward:
    def test_matches_xla_blend(self, rng):
        scene = make_scene(rng)
        out_p = rp.rasterize_pallas(*scene, T_IDENT, K, W, H, **COMMON)
        out_x = rz.rasterize(*scene, T_IDENT, K, W, H, chunk=8, **COMMON)
        np.testing.assert_allclose(out_p.rgb, out_x.rgb, atol=1e-5)
        np.testing.assert_allclose(out_p.alpha, out_x.alpha, atol=1e-5)
        np.testing.assert_allclose(out_p.normal, out_x.normal, atol=1e-5)
        m = np.array(out_x.alpha) > 1e-3
        np.testing.assert_allclose(np.array(out_p.depth)[m],
                                   np.array(out_x.depth)[m], atol=1e-4)

    def test_background(self, rng):
        scene = make_scene(rng, n=4)
        bg = jnp.array([0.3, 0.2, 0.7])
        out = rp.rasterize_pallas(*scene, T_IDENT, K, W, H, bg=bg, **COMMON)
        a = np.array(out.alpha)
        empty = a < 1e-4
        assert empty.any()
        np.testing.assert_allclose(
            np.array(out.rgb)[empty],
            np.broadcast_to(np.array(bg), (empty.sum(), 3)), atol=1e-4)


class TestPallasBackward:
    def test_grads_match_xla(self, rng):
        scene = make_scene(rng, n=32)
        means, quats, scales, opa, col, valid = scene
        bg = jnp.array([0.1, 0.1, 0.1])
        tgt = jnp.linspace(0, 1, H * W * 3).reshape(H, W, 3)

        def loss_with(raster, extra):
            def f(ms, qs, sc, op, cl, th, rh):
                out = raster(ms, qs, sc, op, cl, valid, T_IDENT, K, W, H,
                             theta=th, rho=rh, bg=bg, **COMMON, **extra)
                return (jnp.mean((out.rgb - tgt) ** 2)
                        + 0.05 * jnp.mean(out.alpha)
                        + 0.02 * jnp.mean(out.depth * out.alpha)
                        + 0.01 * jnp.mean(out.normal ** 2))
            return f

        z3 = jnp.zeros(3)
        args = (means, quats, scales, opa, col, z3, z3)
        g_p = jax.grad(loss_with(rp.rasterize_pallas, {}),
                       argnums=tuple(range(7)))(*args)
        g_x = jax.grad(loss_with(rz.rasterize, dict(chunk=8)),
                       argnums=tuple(range(7)))(*args)
        names = ["means", "quats", "scales", "opa", "col", "theta", "rho"]
        for n_, a, b in zip(names, g_p, g_x):
            np.testing.assert_allclose(a, b, atol=5e-4, rtol=2e-3,
                                       err_msg=n_)


def test_contributions_match_xla(rng):
    """Pallas per-gaussian contributions vs the XLA blend's with_contrib."""
    scene = make_scene(rng, 48)
    out_x = rz.rasterize(*scene, T_IDENT, K, W, H, max_per_tile=64,
                         with_contrib=True)
    from pings_tpu.ops.rasterize import bin_gaussians, project_gaussians
    p = project_gaussians(*scene, T_IDENT, K, W, H)
    import jax
    bins = bin_gaussians(jax.tree.map(jax.lax.stop_gradient, p), W, H,
                         max_per_tile=64)
    c = rp.blend_contributions(p, bins, W, H)
    np.testing.assert_allclose(np.asarray(c), np.asarray(out_x.contrib),
                               atol=1e-3, rtol=1e-3)
    assert float(jnp.sum(c)) > 0
