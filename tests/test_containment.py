"""Tracking-failure containment (reference slam_dataset.py:733-740).

Round-3 postmortem: a finite-but-wild registration result passed every
residual/ratio/eigenvalue health gate, was committed, corrupted
T_rel_last, and the constant-velocity guess compounded it exponentially
into NaN within 7 frames. These tests pin the three guards that contain
that failure mode:

1. ``Tracker.track`` rejects a solution that moved further from the
   initial guess than the single-frame lose-track bound
   (40 x surface_sample_range_m) even when all other gates pass.
2. ``SlamSystem.process_frame`` never commits a pose whose per-frame
   translation exceeds that bound — it falls back to the motion-model
   guess, aborts, and records why.
3. The KITTI cam0<->LiDAR GT pose convention (dataset/dataloaders/
   kitti.py Tr handling) round-trips exactly on the committed synthetic
   sequence, so ATE is measured in a consistent frame.
"""

import os

import numpy as np
import pytest

from pings_tpu.config import Config
from pings_tpu.odometry.tracker import LoopOut, Tracker, TrackResult
from pings_tpu.utils import pose as hp

DATA_KITTI = os.path.join(os.path.dirname(__file__), "..",
                          "data_validation", "kitti_synth", "00")


def _cfg(**kw):
    base = dict(
        max_points=1 << 12, buffer_size=1 << 14, voxel_size_m=0.3,
        feature_dim=8, color_feature_dim=8, bs=512,
        geo_mlp_hidden_dim=16, color_mlp_hidden_dim=16,
        gaussian_mlp_hidden_dim=16, pool_capacity=1 << 12,
        surface_sample_range_m=-1.0, free_sample_end_dist_m=-1.0,
        sigma_sigmoid_m=-1.0, max_local_points=512,
        mapping_iters=1, init_iter_ratio=1, gs_on=False, pgo_on=False,
        data_loader_name="synthetic",
    )
    base.update(kw)
    return Config.load(overrides=base)


def _stub_loop_out(T, valid_count=900, total_count=1000):
    return LoopOut(
        T=np.asarray(T, np.float32), H=np.eye(6, dtype=np.float32),
        mean_res=np.float32(0.01), valid_count=np.int32(valid_count),
        total_count=np.int32(total_count), iterations=np.int32(10))


class TestTrackerJumpGate:
    def test_rejects_wild_final_pose(self):
        """100 m from the guess with perfect residual stats: the
        registration basin is ~surface_sample_range wide, so this can only
        be registration against corrupted geometry — must be invalid."""
        cfg = _cfg(track_on=True)
        tracker = Tracker(cfg)
        T_wild = np.eye(4)
        T_wild[:3, 3] = [100.0, 0, 0]
        tracker._track_loop = lambda *a, **k: _stub_loop_out(T_wild)
        res = tracker.track(None, None, np.zeros((10, 3), np.float32),
                            np.ones(10, bool), np.eye(4))
        assert not res.valid
        assert res.degenerate

    def test_rejects_wild_rotation(self):
        cfg = _cfg(track_on=True)
        tracker = Tracker(cfg)
        T_wild = np.eye(4)
        T_wild[:3, :3] = hp.so3_exp(np.array([0.0, 0.0, np.radians(120)]))
        tracker._track_loop = lambda *a, **k: _stub_loop_out(T_wild)
        res = tracker.track(None, None, np.zeros((10, 3), np.float32),
                            np.ones(10, bool), np.eye(4))
        assert not res.valid

    def test_accepts_sane_pose(self):
        cfg = _cfg(track_on=True)
        tracker = Tracker(cfg)
        T_ok = hp.se3_exp(np.array([0.3, -0.1, 0.02, 0.01, 0.0, 0.02]))
        tracker._track_loop = lambda *a, **k: _stub_loop_out(T_ok)
        res = tracker.track(None, None, np.zeros((10, 3), np.float32),
                            np.ones(10, bool), np.eye(4))
        assert res.valid
        assert not res.degenerate
        np.testing.assert_allclose(res.T_w_l, T_ok, atol=1e-5)


class TestPipelineJumpAbort:
    def test_wild_pose_not_committed_and_aborts(self):
        from pings_tpu.data.base import dataset_factory
        from pings_tpu.slam.pipeline import SlamSystem

        cfg = _cfg(track_on=True, min_range=0.5, max_range=25.0,
                   vox_down_m=0.2, source_vox_down_m=0.5)
        ds = dataset_factory("synthetic", "", "3:line", cfg)
        system = SlamSystem(cfg)
        system.process_frame(ds[0])
        p0 = system.poses[-1].copy()

        # a tracker that claims a perfectly healthy registration 100 m away
        T_wild = np.eye(4)
        T_wild[:3, 3] = [100.0, 0, 0]
        system.tracker.track = lambda *a, **k: TrackResult(
            T_w_l=T_wild, valid=True, mean_res=0.01, valid_ratio=0.9,
            iterations=10, cov=None, degenerate=False)
        rep = system.process_frame(ds[1])

        assert system.aborted
        assert "translation" in system.abort_reason
        assert not rep.tracking_valid
        # the wild pose was NOT committed: fell back to the motion-model
        # guess (identity T_rel at startup => stays near the last pose)
        d = np.linalg.norm(system.poses[-1][:3, 3] - p0[:3, 3])
        assert d < 40.0 * cfg.surface_sample_range_m, d
        # and T_rel_last stays bounded so a rerun cannot compound it
        assert np.linalg.norm(system.T_rel_last[:3, 3]) < \
            40.0 * cfg.surface_sample_range_m


@pytest.mark.skipif(not os.path.isdir(DATA_KITTI),
                    reason="data_validation/kitti_synth not generated")
class TestKittiConvention:
    """Pin the cam0->LiDAR GT conversion (VERDICT r3 item 7): the loader
    must recover the generator's LiDAR-frame trajectory exactly from the
    cam0-frame poses.txt + calib Tr it wrote."""

    def _expected_lidar_poses(self, n):
        # mirror of scripts/make_validation_data.py make_kitti's circuit
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "mvd", os.path.join(os.path.dirname(__file__), "..",
                                "scripts", "make_validation_data.py"))
        mvd = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mvd)
        pos2d, yaws = mvd.circuit_path(n, step=1.2)
        poses = []
        for i in range(n):
            T = np.eye(4)
            T[:3, :3] = hp.so3_exp(np.array([0, 0, yaws[i]]))
            T[:3, 3] = [pos2d[i, 0], pos2d[i, 1], 1.6]
            poses.append(T)
        return poses

    def test_gt_roundtrip_ate_zero(self):
        from pings_tpu.data.base import dataset_factory
        from pings_tpu.eval.traj import absolute_error

        cfg = _cfg(track_on=True, kitti_correction_on=False)
        ds = dataset_factory("kitti", os.path.dirname(DATA_KITTI), "00", cfg)
        gt = ds.gt_poses()
        assert gt is not None and len(gt) >= 5
        exp = self._expected_lidar_poses(len(gt))
        ate = absolute_error(gt[:5], exp[:5], align=False)
        assert ate["ate_trans_rmse_m"] < 1e-6, ate
        assert ate["ate_rot_rmse_deg"] < 1e-5, ate

    def test_scan_in_lidar_frame(self):
        """Ground points of scan 0, transformed by GT pose 0, must land on
        the world ground plane z=0 — pins the scan frame against the pose
        frame."""
        cfg = _cfg(track_on=True, kitti_correction_on=False)
        from pings_tpu.data.base import dataset_factory

        ds = dataset_factory("kitti", os.path.dirname(DATA_KITTI), "00", cfg)
        fr = ds[0]
        T = fr["gt_pose"]
        pts_w = fr["points"] @ T[:3, :3].T + T[:3, 3]
        zmin = float(pts_w[:, 2].min())
        assert -0.15 < zmin < 0.15, zmin
        ground_frac = float(np.mean(np.abs(pts_w[:, 2]) < 0.1))
        assert ground_frac > 0.1, ground_frac
