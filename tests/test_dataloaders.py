"""Round-trip tests for the dataset loaders on synthesized on-disk data."""

import os
import struct

import numpy as np
import pytest

from pings_tpu.data.base import available_loaders, dataset_factory
from pings_tpu.data.pointcloud_io import read_pcd, read_ply


def _write_pcd_binary(path, xyz, time=None):
    fields, types = ["x", "y", "z"], ["F", "F", "F"]
    cols = [xyz[:, 0], xyz[:, 1], xyz[:, 2]]
    if time is not None:
        fields.append("time")
        types.append("F")
        cols.append(time)
    n = len(xyz)
    hdr = (f"VERSION .7\nFIELDS {' '.join(fields)}\n"
           f"SIZE {' '.join(['4'] * len(fields))}\n"
           f"TYPE {' '.join(types)}\n"
           f"COUNT {' '.join(['1'] * len(fields))}\n"
           f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
           f"POINTS {n}\nDATA binary\n")
    arr = np.stack(cols, -1).astype("<f4")
    with open(path, "wb") as f:
        f.write(hdr.encode())
        f.write(arr.tobytes())


def _write_ply_binary(path, xyz, rgb=None):
    props = ["property float x", "property float y", "property float z"]
    cols = [xyz[:, 0].astype("<f4"), xyz[:, 1].astype("<f4"),
            xyz[:, 2].astype("<f4")]
    dtype = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    if rgb is not None:
        props += ["property uchar red", "property uchar green",
                  "property uchar blue"]
        dtype += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
        cols += [rgb[:, 0], rgb[:, 1], rgb[:, 2]]
    arr = np.zeros(len(xyz), dtype=dtype)
    for (name, *_), c in zip(dtype, cols):
        arr[name] = c
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(xyz)}\n".encode())
        f.write(("\n".join(props) + "\nend_header\n").encode())
        f.write(arr.tobytes())


def test_pcd_binary_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    t = rng.random(100).astype(np.float32)
    p = str(tmp_path / "a.pcd")
    _write_pcd_binary(p, xyz, t)
    out = read_pcd(p)
    np.testing.assert_allclose(out["xyz"], xyz, rtol=1e-6)
    np.testing.assert_allclose(out["time"], t, rtol=1e-6)


def test_ply_binary_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    rgb = (rng.random((50, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "a.ply")
    _write_ply_binary(p, xyz, rgb)
    out = read_ply(p)
    np.testing.assert_allclose(out["xyz"], xyz, rtol=1e-6)
    np.testing.assert_allclose(out["rgb"], rgb.astype(np.float32) / 255.0,
                               atol=1e-6)


def test_available_loaders_inventory():
    have = set(available_loaders())
    expected = {"generic", "synthetic", "kitti", "kitti360", "replica",
                "tum", "bonn", "azure", "neuralrgbd", "mulran", "ncd",
                "nclt", "apollo", "helipr", "rosbag", "mcap", "ouster"}
    assert expected <= have, expected - have


def test_mulran_loader(tmp_path, rng):
    d = tmp_path / "seq"
    (d / "Ouster").mkdir(parents=True)
    n = 64 * 1024
    stamps = [1560000000000000000 + i * 100000000 for i in range(3)]
    for t in stamps:
        pts = rng.normal(size=(n, 4)).astype(np.float32)
        pts.tofile(str(d / "Ouster" / f"{t}.bin"))
    rows = []
    for i, t in enumerate(stamps):
        T = np.eye(4)
        T[0, 3] = i * 1.0
        rows.append([t] + list(T[:3, :4].reshape(-1)))
    np.savetxt(str(d / "global_pose.csv"), np.array(rows), delimiter=",")
    ds = dataset_factory("mulran", str(d))
    assert len(ds) == 3
    fr = ds[1]
    assert fr["points"].shape == (n, 3)
    assert fr["point_ts"].shape == (n,)
    gt = ds.gt_poses()
    assert len(gt) == 3
    np.testing.assert_allclose(gt[0], np.eye(4), atol=1e-9)


def test_apollo_loader(tmp_path, rng):
    d = tmp_path / "seq"
    (d / "pcds").mkdir(parents=True)
    (d / "poses").mkdir()
    for i in range(1, 4):
        _write_pcd_binary(str(d / "pcds" / f"{i}.pcd"),
                          rng.normal(size=(30, 3)).astype(np.float32))
    rows = [[i, i, 0.5 * i, 0, 0, 0, 0, 0, 1] for i in range(3)]
    np.savetxt(str(d / "poses" / "gt_poses.txt"), np.array(rows, float))
    ds = dataset_factory("apollo", str(d))
    assert len(ds) == 3
    fr = ds[0]
    assert fr["points"].shape == (30, 3)
    gt = ds.gt_poses()
    np.testing.assert_allclose(gt[1][0, 3], 0.5, atol=1e-9)


def test_nclt_loader(tmp_path, rng):
    d = tmp_path / "2012-01-08"
    (d / "velodyne_sync").mkdir(parents=True)
    (tmp_path / "ground_truth").mkdir()
    stamps = [1326000000000000 + i * 100000 for i in range(3)]
    for t in stamps:
        raw = (rng.normal(size=(40, 4)) * 100).astype(np.int16)
        raw.tofile(str(d / "velodyne_sync" / f"{t}.bin"))
    gt_t = np.linspace(stamps[0] - 10, stamps[-1] + 10, 50)
    gt = np.stack([gt_t] + [np.linspace(0, 1, 50)] * 6, -1)
    np.savetxt(str(tmp_path / "ground_truth" /
                   "groundtruth_2012-01-08.csv"), gt, delimiter=",")
    ds = dataset_factory("nclt", str(d))
    assert len(ds) == 3
    assert ds[0]["points"].shape[1] == 3
    assert len(ds.gt_poses()) == 3


def test_helipr_loader(tmp_path, rng):
    (tmp_path / "LiDAR" / "Velodyne").mkdir(parents=True)
    (tmp_path / "LiDAR_GT").mkdir()
    stamps = [1690000000000000000 + i for i in range(2)]
    for t in stamps:
        with open(str(tmp_path / "LiDAR" / "Velodyne" / f"{t}.bin"),
                  "wb") as f:
            for k in range(20):
                f.write(struct.pack("=ffffHf", k * 0.1, k * 0.2, 1.0,
                                    10.0, 3, k * 1e-4))
    with open(str(tmp_path / "LiDAR_GT" / "Velodyne_gt.txt"), "w") as f:
        for i, t in enumerate(stamps):
            f.write(f"{t} {i * 0.5} 0 0 0 0 0 1\n")
    ds = dataset_factory("helipr", str(tmp_path), "Velodyne")
    assert len(ds) == 2
    fr = ds[0]
    assert fr["points"].shape == (20, 3)
    assert fr["point_ts"].min() >= 0 and fr["point_ts"].max() <= 1
    assert len(ds.gt_poses()) == 2


def test_ncd_loader(tmp_path, rng):
    d = tmp_path / "quad"
    (d / "raw_format" / "ouster_scan").mkdir(parents=True)
    (d / "ground_truth").mkdir()
    for i in range(2):
        _write_pcd_binary(
            str(d / "raw_format" / "ouster_scan" /
                f"cloud_158383659{i}_18259097{i}.pcd"),
            rng.normal(size=(64 * 1024, 3)).astype(np.float32))
    rows = [[i, 0, i * 0.1, 0, 0, 0, 0, 0, 1] for i in range(2)]
    np.savetxt(str(d / "ground_truth" / "registered_poses.csv"),
               np.array(rows, float), delimiter=",")
    ds = dataset_factory("ncd", str(d))
    assert len(ds) == 2
    assert ds[0]["points"].shape == (64 * 1024, 3)
    np.testing.assert_allclose(ds.gt_poses()[0], np.eye(4), atol=1e-9)


def test_kitti360_loader(tmp_path, rng):
    seq = "2013_05_28_drive_0000_sync"
    lid = tmp_path / "data_3d_raw" / seq / "velodyne_points" / "data"
    lid.mkdir(parents=True)
    (tmp_path / "calibration").mkdir()
    (tmp_path / "data_poses" / seq).mkdir(parents=True)
    for i in range(2):
        rng.normal(size=(50, 4)).astype(np.float32).tofile(
            str(lid / f"{i:010d}.bin"))
    with open(str(tmp_path / "calibration" / "calib_cam_to_velo.txt"),
              "w") as f:
        f.write("0 -1 0 0.3  0 0 -1 -0.1  1 0 0 -0.05")
    rows = [[i] + list(np.eye(4)[:3, :4].reshape(-1)) for i in range(2)]
    np.savetxt(str(tmp_path / "data_poses" / seq / "poses.txt"),
               np.array(rows, float))
    ds = dataset_factory("kitti360", str(tmp_path), "0000")
    assert len(ds) == 2
    fr = ds[0]
    assert fr["points"].shape == (50, 3)
    assert len(ds.gt_poses()) == 2


def test_bonn_azure_register():
    assert "bonn" in available_loaders()
    assert "azure" in available_loaders()


def test_vbr_loader(tmp_path, rng):
    root = tmp_path
    (root / "ouster_points" / "data").mkdir(parents=True)
    (root / "camera_left" / "data").mkdir(parents=True)
    for i in range(2):
        rng.normal(size=(40, 4)).astype(np.float32).tofile(
            str(root / "ouster_points" / "data" / f"{i:06d}.bin"))
    with open(str(root / "ouster_points" / "timestamps.txt"), "w") as f:
        f.write("2024-01-01T00:00:00.100000000\n2024-01-01T00:00:00.200\n")
    import cv2
    for i in range(2):
        cv2.imwrite(str(root / "camera_left" / "data" / f"{i:06d}.png"),
                    np.zeros((8, 8, 3), np.uint8))
    with open(str(root / "camera_left" / "timestamps.txt"), "w") as f:
        f.write("2024-01-01T00:00:00.10\n2024-01-01T00:00:00.20\n")
    with open(str(root / "vbr_calib.yaml"), "w") as f:
        f.write("cam_l:\n  intrinsics: [400, 400, 320, 240]\n"
                "  T_b: [[1,0,0,0],[0,1,0,0],[0,0,1,0.2],[0,0,0,1]]\n")
    from pings_tpu.data.base import dataset_factory
    ds = dataset_factory("vbr", str(root))
    assert len(ds) == 2
    fr = ds[0]
    assert fr["points"].shape == (40, 3)
    assert "camera_left" in fr["img"]
    assert fr["K"]["camera_left"][0, 0] == 400


def test_kitti_mot_loader(tmp_path, rng):
    seq, split = "0001", "training"
    vdir = tmp_path / "data_tracking_velodyne" / split / "velodyne" / seq
    vdir.mkdir(parents=True)
    cdir = tmp_path / "data_tracking_calib" / split / "calib"
    cdir.mkdir(parents=True)
    for i in range(2):
        rng.normal(size=(30, 4)).astype(np.float32).tofile(
            str(vdir / f"{i:06d}.bin"))
    P = "7.0e+2 0.0e+0 6.0e+2 0.0e+0 0.0e+0 7.0e+2 1.8e+2 0.0e+0 0.0e+0 0.0e+0 1.0e+0 0.0e+0"
    R = "1.0e+0 0.0e+0 0.0e+0 0.0e+0 1.0e+0 0.0e+0 0.0e+0 0.0e+0 1.0e+0"
    Tr = "0.0e+0 -1.0e+0 0.0e+0 0.0e+0 0.0e+0 0.0e+0 -1.0e+0 0.0e+0 1.0e+0 0.0e+0 0.0e+0 0.0e+0"
    with open(str(cdir / f"{seq}.txt"), "w") as f:
        for name, row in [("P0:", P), ("P1:", P), ("P2:", P), ("P3:", P),
                          ("R_rect", R), ("Tr_velo_cam", Tr),
                          ("Tr_imu_velo", Tr)]:
            f.write(f"{name} {row}\n")
    from pings_tpu.data.base import dataset_factory
    ds = dataset_factory("kitti_mot", str(tmp_path), f"{seq}:{split}")
    assert len(ds) == 2
    fr = ds[0]
    assert fr["points"].shape == (30, 3)
    assert ds.K[0, 0] == 700.0


def test_waymo_loader(tmp_path, rng):
    import json as _json
    (tmp_path / "lidars" / "lidar_TOP").mkdir(parents=True)
    (tmp_path / "images_ud" / "cam_FRONT").mkdir(parents=True)
    _write_pcd_binary(str(tmp_path / "lidars" / "lidar_TOP" / "000.pcd"),
                      rng.normal(size=(25, 3)).astype(np.float32))
    import cv2
    cv2.imwrite(str(tmp_path / "images_ud" / "cam_FRONT" / "000.jpg"),
                np.zeros((8, 8, 3), np.uint8))
    tf = {"lidar_TOP": {"extrinsic": np.eye(4).tolist()},
          "cam_FRONT": {"camera_intrinsic": np.eye(3).tolist(),
                        "extrinsic": np.eye(4).tolist()},
          "gt_poses": [np.eye(4).tolist()]}
    with open(str(tmp_path / "transform.json"), "w") as f:
        _json.dump(tf, f)
    from pings_tpu.data.base import dataset_factory
    ds = dataset_factory("waymo", str(tmp_path))
    assert len(ds) == 1
    fr = ds[0]
    assert fr["points"].shape == (25, 3)
    assert "cam_FRONT" in fr["img"]


def test_kitti_semantic_labels(tmp_path):
    """SemanticKITTI raw labels are reduced to the 20-class training-id
    space (learning_map): raw ids like road=40/building=50 must land in
    [0, 20) of the sem_class_count softmax, outliers/unlabeled become -1,
    and moving classes are ignored by default (filter_moving_object)."""
    import numpy as np
    from pings_tpu.data.kitti import KittiDataset

    seq = tmp_path / "00"
    (seq / "velodyne").mkdir(parents=True)
    (seq / "labels").mkdir()
    raw = np.array([0, 1, 10, 30, 40, 44, 48, 50, 51, 70, 71, 72, 80, 81,
                    99, 252, 254, 259], np.uint32)
    pts = np.random.rand(len(raw), 4).astype(np.float32) * 5
    pts.tofile(seq / "velodyne" / "000000.bin")
    lab = raw | (7 << 16)  # instance bits in the high half
    lab.astype(np.uint32).tofile(seq / "labels" / "000000.label")

    ds = KittiDataset(str(tmp_path), "00")
    fr = ds[0]
    assert "sem" in fr and fr["sem"].dtype == np.int32
    sem = fr["sem"]
    # everything indexes the 20-class softmax or is the ignore sentinel
    assert sem.min() >= -1 and sem.max() < 20
    expected = np.array([-1, -1, 1, 6, 9, 10, 11, 13, 14, 15, 16, 17, 18,
                         19, -1, -1, -1, -1], np.int32)  # moving ignored
    np.testing.assert_array_equal(sem, expected)

    # with filter_moving_object off, moving classes map to their static
    # counterparts (moving-car 252 -> car 1, moving-person 254 -> 6)
    class Cfg:
        filter_moving_object = False
    ds2 = KittiDataset(str(tmp_path), "00", cfg=Cfg())
    sem2 = ds2[0]["sem"]
    np.testing.assert_array_equal(sem2[-3:], [1, 6, 5])


def test_ouster_pcap_loader(tmp_path):
    """From-scratch Ouster pcap decoding (reference ouster.py uses the
    vendor SDK): LEGACY packet layout + beam-model XYZ reconstruction on
    a synthetic capture — ranges at 10 m must come back as points ~10 m
    from the sensor with per-column timestamps."""
    import json as _json
    import struct

    H, W, CPP = 16, 64, 16            # beams, columns/frame, cols/packet
    meta = {
        "beam_altitude_angles": list(np.linspace(-15, 15, H)),
        "beam_azimuth_angles": [0.0] * H,
        "lidar_origin_to_beam_origin_mm": 12.0,
        "lidar_mode": f"{W}x10",
        "lidar_data_format": {
            "columns_per_frame": W, "pixels_per_column": H,
            "columns_per_packet": CPP, "udp_profile_lidar": "LEGACY",
        },
        "lidar_to_sensor_transform":
            [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 36.18, 0, 0, 0, 1],
    }
    mpath = tmp_path / "os_meta.json"
    mpath.write_text(_json.dumps(meta))

    rng_m = 10.0

    def legacy_packet(frame_id, mid0):
        blocks = b""
        for c in range(CPP):
            mid = mid0 + c
            hdr = struct.pack("<QHHI", 1000 + mid, mid, frame_id, 0)
            ch = b""
            for r in range(H):
                ch += struct.pack("<IHHHH", int(rng_m * 1000), 100, 50,
                                  10, 0)
            blocks += hdr + ch + struct.pack("<I", 0xFFFFFFFF)
        return blocks

    def udp_frame(payload):
        udp = struct.pack(">HHHH", 50000, 7502, 8 + len(payload), 0) \
            + payload
        ip = struct.pack(">BBHHHBBH4s4s", 0x45, 0, 20 + len(udp), 0, 0,
                         64, 17, 0, b"\x0a\x00\x00\x01",
                         b"\x0a\x00\x00\x02") + udp
        eth = b"\x00" * 12 + struct.pack(">H", 0x0800) + ip
        return eth

    pcap = struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    for fid in range(2):               # two full scans
        for mid0 in range(0, W, CPP):
            fr = udp_frame(legacy_packet(fid, mid0))
            pcap += struct.pack("<IIII", 0, 0, len(fr), len(fr)) + fr
    ppath = tmp_path / "os_capture.pcap"
    ppath.write_bytes(pcap)

    from pings_tpu.data.base import dataset_factory
    ds = dataset_factory("ouster", str(ppath))
    assert len(ds) == 2
    fr = ds[0]
    pts, ts = fr["points"], fr["point_ts"]
    assert pts.shape == (H * W, 3)
    # every return is ~10 m from the beam origin (mm-level model offsets)
    d = np.linalg.norm(pts - np.array([0, 0, 0.03618]), axis=1)
    np.testing.assert_allclose(d, rng_m, atol=0.05)
    # the horizontal beam ring spans the full azimuth circle
    az = np.degrees(np.arctan2(pts[:, 1], pts[:, 0]))
    assert az.max() - az.min() > 300
    # per-column phase timestamps in [0, 1)
    assert ts.min() >= 0 and ts.max() < 1 and len(np.unique(ts)) == W
