import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pings_tpu.config import Config
from pings_tpu.odometry.tracker import Tracker
from pings_tpu.utils import pose as hp

from helpers import build_trained_corner_map, corner_scan


@pytest.fixture(scope="module")
def corner_map():
    rng = np.random.default_rng(7)
    cfg = Config.load(overrides=dict(
        max_points=16384, buffer_size=1 << 16, voxel_size_m=0.25,
        feature_dim=8, color_feature_dim=8, bs=2048,
        geo_mlp_hidden_dim=32, color_mlp_hidden_dim=32,
        pool_capacity=1 << 15, lr=0.02, lr_mlp_base=2e-3,
        surface_sample_range_m=-1.0, free_sample_end_dist_m=-1.0,
        sigma_sigmoid_m=-1.0,  # derive from voxel size (reference ratios)
    ))
    m, d = build_trained_corner_map(rng, cfg, iters=400)
    return cfg, m, d


@pytest.mark.slow
class TestTracker:
    def test_recovers_small_offset(self, corner_map, rng):
        cfg, m, d = corner_map
        tracker = Tracker(cfg)
        # new scan from a slightly different viewpoint, expressed in the
        # *sensor* frame of the true pose
        T_true = hp.se3_exp(np.array([0.05, -0.08, 0.04, 0.01, -0.02, 0.015]))
        pts_w, _ = corner_scan(rng, 1500, sensor=np.array([2.0, 2, 2]))
        T_inv = hp.se3_inv(T_true)
        src = (pts_w @ T_inv[:3, :3].T + T_inv[:3, 3]).astype(np.float32)

        res = tracker.track(m, d, src, np.ones(len(src), bool), np.eye(4))
        assert res.valid, (res.mean_res, res.valid_ratio)
        t_err = np.linalg.norm(res.T_w_l[:3, 3] - T_true[:3, 3])
        r_err = hp.rotation_angle_deg(res.T_w_l[:3, :3].T @ T_true[:3, :3])
        assert t_err < 0.03, t_err
        assert r_err < 0.5, r_err
        assert not res.degenerate

    def test_identity_stays_put(self, corner_map, rng):
        cfg, m, d = corner_map
        tracker = Tracker(cfg)
        pts_w, _ = corner_scan(rng, 1500, sensor=np.array([2.0, 2, 2]))
        res = tracker.track(m, d, pts_w, np.ones(len(pts_w), bool), np.eye(4))
        assert res.valid
        assert np.linalg.norm(res.T_w_l[:3, 3]) < 0.02
        assert hp.rotation_angle_deg(res.T_w_l[:3, :3]) < 0.3

    def test_far_off_map_invalid(self, corner_map, rng):
        cfg, m, d = corner_map
        tracker = Tracker(cfg)
        src = rng.normal(size=(500, 3)).astype(np.float32) + 100.0
        res = tracker.track(m, d, src, np.ones(500, bool), np.eye(4))
        assert not res.valid


@pytest.mark.slow
def test_photometric_tracking_breaks_rotational_degeneracy(rng):
    """A sphere is SDF-invariant under rotation about the axis through the
    sensor and its center: geometry-only registration cannot recover a
    rotation offset about that axis, the photometric color rows can
    (reference implicit_color_reg, tracker.py:692-737)."""
    from tests.test_mapper_fidelity import small_cfg, _trained_sphere_map
    from pings_tpu.odometry.tracker import Tracker
    from pings_tpu.utils import pose as hp

    cfg_geo = small_cfg(photometric_loss_on=False, eigenvalue_check=False,
                        reg_iter_n=30)
    cfg_photo = small_cfg(photometric_loss_on=True,
                          photometric_loss_weight=1.0,
                          eigenvalue_check=False, reg_iter_n=30)
    m, decoders, _, origin = _trained_sphere_map(cfg_geo, rng, iters=150)

    # source scan: sphere-surface points in the sensor frame (identity pose)
    from tests.test_gs_mapping import raycast_target, sphere_color, CENTER
    _, _, _, pts_w, _ = raycast_target()
    sub = rng.choice(len(pts_w), size=1024, replace=False)
    src = pts_w[sub]
    inten = sphere_color(src).mean(-1).astype(np.float32)

    # initial guess: rotated about the z axis (through origin and sphere
    # center) by 8 degrees -- geometrically unobservable
    ang = np.deg2rad(8.0)
    T0 = np.eye(4)
    T0[:3, :3] = hp.so3_exp(np.array([0.0, 0.0, ang]))

    def rot_err_deg(T):
        return np.degrees(np.arccos(np.clip(
            (np.trace(T[:3, :3]) - 1) / 2, -1, 1)))

    res_g = Tracker(cfg_geo).track(
        m, decoders, src, np.ones(len(src), bool), T0)
    res_p = Tracker(cfg_photo).track(
        m, decoders, src, np.ones(len(src), bool), T0,
        source_intensity=inten)
    e_g = rot_err_deg(res_g.T_w_l)
    e_p = rot_err_deg(res_p.T_w_l)
    # geometry-only stays stuck near 8 deg; photometric recovers most of it
    assert e_g > 4.0, e_g
    assert e_p < 0.6 * e_g, (e_g, e_p)
