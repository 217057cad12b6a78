"""VisPacket round-trip + standalone viewer baking."""

import os

import numpy as np

from pings_tpu.vis.packet import VisPacket, downsample_points, load_packets
from pings_tpu.vis.viewer import write_viewer


def make_packet(rng, fid=3):
    n = 500
    pkt = VisPacket(frame_id=fid)
    pkt.neural_points = rng.random((n, 3)).astype(np.float32) * 10
    pkt.neural_colors = (rng.random((n, 3)) * 255).astype(np.uint8)
    pkt.scan_points = rng.random((200, 3)).astype(np.float32)
    pkt.traj_est = np.cumsum(rng.random((20, 3)), 0).astype(np.float32)
    pkt.traj_gt = pkt.traj_est + 0.1
    pkt.cam_poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    pkt.cam_intrinsics = np.tile([300.0, 300.0, 640, 480],
                                 (2, 1)).astype(np.float32)
    pkt.mesh_verts = rng.random((30, 3)).astype(np.float32)
    pkt.mesh_tris = rng.integers(0, 30, (40, 3)).astype(np.int32)
    pkt.sdf_slice = rng.normal(size=(16, 16)).astype(np.float32)
    pkt.sdf_slice_meta = np.array([0, 0, 1.0, 0.5], np.float32)
    pkt.images["render_rgb"] = (rng.random((24, 32, 3))
                                * 255).astype(np.uint8)
    return pkt


class TestVisPacket:
    def test_roundtrip(self, rng, tmp_path):
        pkt = make_packet(rng)
        path = os.path.join(tmp_path, "vis", "frame_00003.npz")
        pkt.save(path)
        back = VisPacket.load(path)
        assert back.frame_id == 3
        np.testing.assert_array_equal(back.neural_points, pkt.neural_points)
        np.testing.assert_array_equal(back.images["render_rgb"],
                                      pkt.images["render_rgb"])
        pkts = load_packets(os.path.join(tmp_path, "vis"))
        assert len(pkts) == 1 and pkts[0].frame_id == 3

    def test_downsample(self, rng):
        pts = rng.random((1000, 3)).astype(np.float32)
        out, _ = downsample_points(pts, None, 100)
        assert len(out) <= 100


class TestViewer:
    def test_write_viewer(self, rng, tmp_path):
        pkts = [make_packet(rng, fid=i) for i in (0, 5)]
        out = write_viewer(os.path.join(tmp_path, "viewer.html"), pkts)
        html = open(out).read()
        assert html.startswith("<!doctype html>")
        # both packets embedded with all layers
        for key in ("neural", "scan", "traj_est", "traj_gt", "cams",
                    "mesh", "sdf", "render_rgb"):
            assert key in html
        assert '"frame_id": 5' in html
        assert len(html) > 10_000
