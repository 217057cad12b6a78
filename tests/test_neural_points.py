import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pings_tpu.config import Config
from pings_tpu.models import neural_points as npm


@pytest.fixture
def cfg():
    c = Config()
    c.max_points = 4096
    c.buffer_size = 1 << 14
    c.voxel_size_m = 0.5
    c.feature_dim = 4
    c.color_feature_dim = 4
    return c.derive()


def insert(m, pts, ts=0, travel=None, thre=1e9):
    n = pts.shape[0]
    if travel is None:
        travel = jnp.zeros(128)
    return npm.insert_points(
        m, jnp.asarray(pts, jnp.float32),
        jnp.zeros((n, 3)), jnp.ones(n, bool),
        jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        jnp.int32(ts), travel, jnp.float32(thre),
    )


class TestInsert:
    def test_insert_then_query_roundtrip(self, cfg, rng):
        m = npm.init_map(cfg)
        pts = (rng.random((128, 3)) * 20).astype(np.float32)
        m = insert(m, pts)
        n = int(m.count)
        assert 1 <= n <= 128
        # every kept point should be findable by querying at its own position
        q = npm.query_feature(m, jnp.asarray(pts), k=4)
        assert np.all(np.array(q.valid))
        # nearest neighbor of a stored point queried at itself = dist 0
        stored = np.array(m.positions[:n])
        q2 = npm.query_feature(m, jnp.asarray(stored), k=1)
        nn_pos = np.array(m.positions)[np.array(q2.nn_idx[:, 0])]
        np.testing.assert_allclose(nn_pos, stored, atol=1e-5)

    def test_same_voxel_not_duplicated(self, cfg):
        m = npm.init_map(cfg)
        pts = np.array([[0.1, 0.1, 0.1]], np.float32)
        m = insert(m, pts, ts=0)
        m = insert(m, pts + 0.05, ts=1)  # same voxel, not stale
        assert int(m.count) == 1
        # ts_update refreshed on the matched existing point
        assert int(m.ts_update[0]) == 1

    def test_stale_overwrite(self, cfg):
        m = npm.init_map(cfg)
        travel = jnp.asarray(np.arange(128, dtype=np.float32) * 10)
        pts = np.array([[0.1, 0.1, 0.1]], np.float32)
        m = insert(m, pts, ts=0, travel=travel, thre=50.0)
        m = insert(m, pts, ts=20, travel=travel, thre=50.0)  # gap 200 > 50
        assert int(m.count) == 2  # stale slot overwritten by a new point
        # hash now resolves to the newer point
        q = npm.query_feature(m, jnp.asarray(pts), k=1)
        assert int(q.nn_idx[0, 0]) == 1

    def test_capacity_respected(self, cfg, rng):
        cfg.max_points = 64
        m = npm.init_map(cfg)
        pts = (rng.random((512, 3)) * 100).astype(np.float32)
        m = insert(m, pts)
        assert int(m.count) <= 64


class TestQuery:
    def test_idw_weights_sum_to_one(self, cfg, rng):
        m = npm.init_map(cfg)
        pts = (rng.random((256, 3)) * 10).astype(np.float32)
        m = insert(m, pts)
        q = npm.query_feature(m, jnp.asarray(pts[:32] + 0.1), k=6)
        w = np.array(q.weights)
        valid = np.array(q.valid)
        np.testing.assert_allclose(np.sum(w[valid], axis=-1), 1.0, atol=1e-4)

    def test_query_far_away_invalid(self, cfg, rng):
        m = npm.init_map(cfg)
        m = insert(m, (rng.random((64, 3)) * 5).astype(np.float32))
        q = npm.query_feature(m, jnp.array([[1000.0, 1000, 1000]]), k=6)
        assert not bool(q.valid[0])
        assert int(q.nn_count[0]) == 0

    def test_neighbors_sorted_by_distance(self, cfg):
        m = npm.init_map(cfg)
        pts = np.array([[0.2, 0.2, 0.2], [0.7, 0.2, 0.2], [0.2, 0.7, 0.7]],
                       np.float32)
        m = insert(m, pts)
        q = npm.query_feature(m, jnp.array([[0.2, 0.2, 0.25]]), k=3)
        d = np.linalg.norm(
            np.array(m.positions)[np.array(q.nn_idx[0])] - [0.2, 0.2, 0.25],
            axis=-1,
        )
        valid_k = int(q.nn_count[0])
        assert np.all(np.diff(d[:valid_k]) >= -1e-6)

    def test_certainty_accumulation(self, cfg, rng):
        m = npm.init_map(cfg)
        pts = (rng.random((64, 3)) * 5).astype(np.float32)
        m = insert(m, pts)
        q = npm.query_feature(m, jnp.asarray(pts), k=4)
        m2 = npm.accumulate_certainty(m, q)
        assert float(jnp.sum(m2.certainty)) > float(jnp.sum(m.certainty))
        assert float(m2.certainty[-1]) == 0.0


class TestPGO:
    def test_adjust_map_translates(self, cfg, rng):
        m = npm.init_map(cfg)
        pts = (rng.random((32, 3)) * 5).astype(np.float32)
        m = insert(m, pts, ts=0)
        deltas = jnp.tile(jnp.eye(4), (8, 1, 1))
        deltas = deltas.at[0, :3, 3].set(jnp.array([1.0, 2.0, 3.0]))
        n = int(m.count)
        old = np.array(m.positions[:n])
        m2 = npm.adjust_map(m, deltas)
        np.testing.assert_allclose(np.array(m2.positions[:n]), old + [1, 2, 3],
                                   atol=1e-5)

    def test_recreate_hash_resolves_queries(self, cfg, rng):
        m = npm.init_map(cfg)
        pts = (rng.random((128, 3)) * 10).astype(np.float32)
        m = insert(m, pts)
        n = int(m.count)
        # shift the map, then recreate hash: queries at new positions work
        deltas = jnp.tile(jnp.eye(4), (8, 1, 1)).at[:, :3, 3].set(
            jnp.array([5.0, 0, 0]))
        m2 = npm.adjust_map(m, deltas)
        m2 = npm.recreate_hash(m2)
        q = npm.query_feature(m2, m2.positions[:n], k=1)
        assert np.all(np.array(q.valid))

    def test_prune(self, cfg, rng):
        m = npm.init_map(cfg)
        pts = (rng.random((64, 3)) * 10).astype(np.float32)
        m = insert(m, pts)
        n = int(m.count)
        cert = m.certainty.at[:n // 2].set(10.0)
        m = m.replace(certainty=cert)
        m2 = npm.prune_map(m, jnp.float32(2.0))
        kept = np.array(m2.valid_mask[:n])
        assert np.sum(kept) == n // 2


class TestNearestFirstLocalMask:
    def test_adaptive_truncation_keeps_nearest(self, cfg):
        """Over-cap local windows must keep the NEAREST points, not the
        first-inserted (r5: the insertion-order nonzero cut dropped the
        camera's frontier on the kitti circuit — online PSNR 18 -> 10).
        Displaced local points must fall into the surrounding mask."""
        m = npm.init_map(cfg)
        rng = np.random.default_rng(0)
        # 600 points: 300 FAR (inserted FIRST, at r in [20, 28]) then
        # 300 NEAR (r in [1, 8]); radius 30 so all are 'local'
        far = rng.uniform(20, 28, (300, 1)) * _unit(rng, 300)
        near = rng.uniform(1, 8, (300, 1)) * _unit(rng, 300)
        m = insert(m, far, ts=0)
        m = insert(m, near, ts=0)
        origin = jnp.zeros(3)
        travel = jnp.zeros(128)
        local, sur = npm.compute_local_mask(
            m, origin, jnp.int32(0), travel, jnp.float32(30.0),
            jnp.float32(1e9), max_local=300)
        d = np.linalg.norm(np.asarray(m.positions), axis=-1)
        loc = np.asarray(local)
        s = np.asarray(sur)
        assert loc.sum() <= 300 + 64  # bin-granularity slack
        # every kept point is nearer than every dropped-but-in-radius one
        kept_max = d[loc].max()
        displaced = (~loc) & s & (d < 30.0)
        assert displaced.sum() > 0
        assert kept_max <= d[displaced].min() + 1e-5
        # nothing within radius vanished entirely (the last buffer slot
        # is the padding sentinel, excluded by design)
        active = np.asarray(m.valid_mask) & (d < 30.0)
        active[-1] = False
        assert np.all(loc[active] | s[active])

    def test_under_cap_unchanged(self, cfg):
        m = npm.init_map(cfg)
        rng = np.random.default_rng(1)
        pts = rng.uniform(-5, 5, (200, 3))
        m = insert(m, pts)
        travel = jnp.zeros(128)
        a, _ = npm.compute_local_mask(
            m, jnp.zeros(3), jnp.int32(0), travel, jnp.float32(30.0),
            jnp.float32(1e9))
        b, _ = npm.compute_local_mask(
            m, jnp.zeros(3), jnp.int32(0), travel, jnp.float32(30.0),
            jnp.float32(1e9), max_local=4096, max_surround=4096)
        assert np.array_equal(np.asarray(a), np.asarray(b))


def _unit(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)
