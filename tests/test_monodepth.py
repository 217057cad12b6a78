"""Mono-depth alignment math (reference slam_dataset.py:333-480)."""

import numpy as np

from pings_tpu.data.monodepth import (
    align_depth_to_lidar, densify_depth, sky_mask_from_depth,
)


class TestAlign:
    def test_recovers_affine(self, rng):
        h, w = 40, 60
        metric = rng.uniform(2, 50, (h, w)).astype(np.float32)
        mono = (metric - 1.5) / 2.0              # metric = 2*mono + 1.5
        lidar = np.zeros((h, w), np.float32)
        idx = rng.random((h, w)) < 0.1           # sparse returns
        lidar[idx] = metric[idx]
        aligned, a, b = align_depth_to_lidar(mono, lidar)
        assert abs(a - 2.0) < 1e-3 and abs(b - 1.5) < 1e-2
        np.testing.assert_allclose(aligned, metric, atol=0.05)

    def test_robust_to_outliers(self, rng):
        h, w = 40, 60
        metric = rng.uniform(2, 50, (h, w)).astype(np.float32)
        mono = metric / 3.0
        lidar = np.zeros((h, w), np.float32)
        idx = rng.random((h, w)) < 0.2
        lidar[idx] = metric[idx]
        # corrupt 10% of returns heavily
        bad = idx & (rng.random((h, w)) < 0.1)
        lidar[bad] *= 5.0
        _, a, b = align_depth_to_lidar(mono, lidar)
        assert abs(a - 3.0) < 0.25

    def test_underdetermined(self):
        aligned, a, b = align_depth_to_lidar(
            np.ones((10, 10)), np.zeros((10, 10)))
        assert aligned is None and a == 1.0

    def test_sky_mask(self, rng):
        mono = rng.uniform(1, 10, (20, 20))
        mono[:5] = 100.0                          # far plateau = sky
        sky = sky_mask_from_depth(mono)
        assert sky[:5].all() and not sky[10:].any()


class TestDensify:
    def test_fills_holes_keeps_lidar(self, rng):
        h, w = 30, 40
        metric = rng.uniform(2, 20, (h, w)).astype(np.float32)
        lidar = np.zeros((h, w), np.float32)
        idx = rng.random((h, w)) < 0.15
        lidar[idx] = metric[idx]
        provider = lambda rgb: metric * 0.5       # raw mono, half scale
        rgb = np.zeros((h, w, 3), np.uint8)
        dense, sky = densify_depth(rgb, lidar, provider, max_depth=80.0)
        np.testing.assert_allclose(dense[idx], lidar[idx])   # lidar wins
        hole = ~idx & ~sky
        np.testing.assert_allclose(dense[hole], metric[hole], atol=0.1)
