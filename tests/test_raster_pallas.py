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
    c = rp.blend_contributions(rp.gauss_attr_matrix(p), bins, W, H)
    np.testing.assert_allclose(np.asarray(c), np.asarray(out_x.contrib),
                               atol=1e-3, rtol=1e-3)
    assert float(jnp.sum(c)) > 0


class TestPallasSurfel:
    """Surfel-mode Pallas kernel vs the XLA surfel arbiter
    (blend_tiles_surfel): per-pixel plane depth, blended normals, median
    depth, and gradients (VERDICT r2 item 3: the reference's default
    gs_type now runs the fused kernel)."""

    def _flat_scene(self, rng, n=40):
        """Disc-like splats (surfel spawn thins the z scale)."""
        means, quats, scales, opa, col, valid = make_scene(rng, n)
        scales = scales.at[:, 2].set(1e-7)
        return means, quats, scales, opa, col, valid

    @staticmethod
    def _close_robust(a, b, atol, frac=2e-3, hard_atol=1e-2):
        """Tight tolerance on >= 1-frac of pixels, a hard bound on the
        rest: kernel and arbiter round the gate quantities (q, plane
        depth s) differently, so a handful of pixels right at the
        q-cutoff / z-gate boundaries can flip (O(1e-3) rgb deltas — far
        below the CUDA reference's own run-to-run noise)."""
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert (d > atol).mean() <= frac, \
            f"{(d > atol).mean():.4%} of elements beyond {atol}"
        assert d.max() <= hard_atol, f"max delta {d.max()}"

    def test_forward_matches_xla(self, rng):
        scene = self._flat_scene(rng)
        out_p = rp.rasterize_pallas(*scene, T_IDENT, K, W, H,
                                    mode="surfel", **COMMON)
        out_x = rz.rasterize(*scene, T_IDENT, K, W, H, chunk=8,
                             mode="surfel", **COMMON)
        self._close_robust(out_p.rgb, out_x.rgb, atol=2e-5)
        self._close_robust(out_p.alpha, out_x.alpha, atol=2e-5)
        self._close_robust(out_p.normal, out_x.normal, atol=2e-5)
        m = np.array(out_x.alpha) > 0.5
        assert m.any()
        self._close_robust(np.array(out_p.depth)[m],
                           np.array(out_x.depth)[m], atol=1e-3,
                           hard_atol=5e-2)
        self._close_robust(np.array(out_p.depth_median)[m],
                           np.array(out_x.depth_median)[m], atol=1e-3,
                           hard_atol=5e-2)

    def test_grads_match_xla(self, rng):
        scene = self._flat_scene(rng, n=28)
        means, quats, scales, opa, col, valid = scene
        bg = jnp.array([0.2, 0.1, 0.3])
        tgt = jnp.linspace(0, 1, H * W * 3).reshape(H, W, 3)

        def loss_with(raster, extra):
            def f(ms, qs, sc, op, cl, th, rh):
                out = raster(ms, qs, sc, op, cl, valid, T_IDENT, K, W, H,
                             theta=th, rho=rh, bg=bg, mode="surfel",
                             **COMMON, **extra)
                a = out.alpha
                return (jnp.mean((out.rgb - tgt) ** 2)
                        + 0.05 * jnp.mean(a)
                        + 0.02 * jnp.mean(out.depth * a)
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
            np.testing.assert_allclose(a, b, atol=1e-3, rtol=5e-3,
                                       err_msg=n_)


class TestBinsReuse:
    def test_cached_bins_identical_output(self, rng):
        """rasterize_pallas(bins=...) must reproduce the fresh-bins render
        bit-for-bit when the scene is unchanged (training-loop reuse)."""
        scene = make_scene(rng)
        out1, bins, means2d = rp.rasterize_pallas(
            *scene, T_IDENT, K, W, H, return_bins=True, **COMMON)
        assert means2d.shape == (scene[0].shape[0], 2)
        out2 = rp.rasterize_pallas(*scene, T_IDENT, K, W, H, bins=bins,
                                   **COMMON)
        np.testing.assert_array_equal(np.asarray(out1.rgb),
                                      np.asarray(out2.rgb))
        np.testing.assert_array_equal(np.asarray(out1.alpha),
                                      np.asarray(out2.alpha))

    def test_stale_bins_small_drift_close(self, rng):
        """Slightly moved gaussians rendered with stale bins stay close to
        the fresh-bins render (the drift-guard regime)."""
        scene = make_scene(rng)
        _, bins, _ = rp.rasterize_pallas(*scene, T_IDENT, K, W, H,
                                         return_bins=True, **COMMON)
        means2 = scene[0] + 0.002  # ~0.1 px at this focal/depth
        out_stale = rp.rasterize_pallas(means2, *scene[1:], T_IDENT, K,
                                        W, H, bins=bins, **COMMON)
        out_fresh = rp.rasterize_pallas(means2, *scene[1:], T_IDENT, K,
                                        W, H, **COMMON)
        np.testing.assert_allclose(np.asarray(out_stale.rgb),
                                   np.asarray(out_fresh.rgb), atol=2e-2)


def test_occluded_gaussian_low_contribution(rng):
    """An occluded gaussian keeps high alpha but ~zero blend contribution
    — exactly what the GS-SDF consistency gate must exclude (reference
    gs_contribution_threshold, utils/mapper.py:1364-1366)."""
    means = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 5.0]])  # same ray
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
    scales = jnp.full((2, 3), 0.5)
    opa = jnp.array([0.99, 0.9])      # front nearly opaque
    col = jnp.ones((2, 3)) * 0.5
    valid = jnp.ones(2, bool)
    out = rp.rasterize_pallas(means, quats, scales, opa, col, valid,
                              T_IDENT, K, W, H, with_contrib=True,
                              **COMMON)
    c = np.asarray(out.contrib)
    assert c[0] > 10.0                 # front gaussian dominates pixels
    assert c[1] < 0.2 * c[0]           # occluded one contributes little
