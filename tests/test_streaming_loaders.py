"""Streaming loaders against tiny self-written fixtures: a ROS1 bag, an
MCAP (ROS1- and CDR-encoded), and a nuScenes-schema mini tree."""

import json
import os
import struct

import numpy as np
import pytest

from pings_tpu.data.base import dataset_factory


# ---------------------------------------------------------------------------
# fixture writers
# ---------------------------------------------------------------------------

def _hdr_fields(**fields) -> bytes:
    out = b""
    for k, v in fields.items():
        item = k.encode() + b"=" + v
        out += struct.pack("<I", len(item)) + item
    return out


def _record(header: bytes, data: bytes) -> bytes:
    return (struct.pack("<I", len(header)) + header
            + struct.pack("<I", len(data)) + data)


def _ros1_string(s: bytes) -> bytes:
    return struct.pack("<I", len(s)) + s


def ros1_pointcloud2(pts: np.ndarray, stamp=(7, 500)) -> bytes:
    n = len(pts)
    fields = [(b"x", 0, 7), (b"y", 4, 7), (b"z", 8, 7),
              (b"intensity", 12, 7), (b"t", 16, 7)]
    body = struct.pack("<I", 0) + struct.pack("<II", *stamp) \
        + _ros1_string(b"lidar")
    body += struct.pack("<II", 1, n)
    body += struct.pack("<I", len(fields))
    for name, off, dt in fields:
        body += _ros1_string(name) + struct.pack("<IBI", off, dt, 1)
    data = np.zeros((n, 5), np.float32)
    data[:, :3] = pts
    data[:, 3] = 0.5
    data[:, 4] = np.linspace(0, 0.1, n)
    raw = data.tobytes()
    body += struct.pack("<B", 0) + struct.pack("<II", 20, 20 * n)
    body += _ros1_string(raw) + struct.pack("<B", 1)
    return body


def write_ros1_bag(path, clouds, topic=b"/points"):
    conn_data = _hdr_fields(
        topic=topic, type=b"sensor_msgs/PointCloud2",
        md5sum=b"0" * 32, message_definition=b"")
    records = _record(
        _hdr_fields(op=b"\x07", conn=struct.pack("<I", 0), topic=topic),
        conn_data)
    for i, pts in enumerate(clouds):
        payload = ros1_pointcloud2(pts, stamp=(10 + i, 0))
        records += _record(
            _hdr_fields(op=b"\x02", conn=struct.pack("<I", 0),
                        time=struct.pack("<II", 10 + i, 0)), payload)
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        # bag header record (op=0x03), padded data ignored by the reader
        f.write(_record(_hdr_fields(
            op=b"\x03", index_pos=struct.pack("<Q", 0),
            conn_count=struct.pack("<I", 1),
            chunk_count=struct.pack("<I", 1)), b" " * 64))
        # one uncompressed chunk holding everything
        f.write(_record(_hdr_fields(
            op=b"\x05", compression=b"none",
            size=struct.pack("<I", len(records))), records))


def cdr_pointcloud2(pts: np.ndarray) -> bytes:
    """Little-endian CDR encoding of sensor_msgs/msg/PointCloud2."""
    buf = bytearray(b"\x00\x01\x00\x00")

    def align(n):
        rem = (len(buf) - 4) % n
        if rem:
            buf.extend(b"\x00" * (n - rem))

    def u8(v): buf.append(v)

    def u32(v): align(4); buf.extend(struct.pack("<I", v))

    def i32(v): align(4); buf.extend(struct.pack("<i", v))

    def string(s):
        u32(len(s) + 1)
        buf.extend(s + b"\x00")

    i32(7)          # stamp.sec
    u32(500)        # stamp.nanosec
    string(b"lidar")
    u32(1)          # height
    n = len(pts)
    u32(n)          # width
    fields = [(b"x", 0, 7), (b"y", 4, 7), (b"z", 8, 7)]
    u32(len(fields))
    for name, off, dt in fields:
        string(name)
        u32(off)
        u8(dt)
        u32(1)
    u8(0)           # is_bigendian
    u32(12)         # point_step
    u32(12 * n)     # row_step
    raw = pts.astype(np.float32).tobytes()
    u32(len(raw))
    buf.extend(raw)
    u8(1)           # is_dense
    return bytes(buf)


def _mcap_string(s: bytes) -> bytes:
    return struct.pack("<I", len(s)) + s


def _mcap_record(op: int, payload: bytes) -> bytes:
    return struct.pack("<BQ", op, len(payload)) + payload


def write_mcap(path, clouds, encoding="cdr", topic=b"/points",
               in_chunk=False):
    schema_name = (b"sensor_msgs/msg/PointCloud2" if encoding == "cdr"
                   else b"sensor_msgs/PointCloud2")
    recs = _mcap_record(0x03, struct.pack("<H", 1)
                        + _mcap_string(schema_name)
                        + _mcap_string(b"ros2msg")
                        + struct.pack("<I", 0))
    recs += _mcap_record(0x04, struct.pack("<HH", 1, 1)
                         + _mcap_string(topic)
                         + _mcap_string(encoding.encode())
                         + struct.pack("<I", 0))
    for i, pts in enumerate(clouds):
        payload = (cdr_pointcloud2(pts) if encoding == "cdr"
                   else ros1_pointcloud2(pts))
        recs += _mcap_record(
            0x05, struct.pack("<HIQQ", 1, i, (10 + i) * 10**9,
                              (10 + i) * 10**9) + payload)
    with open(path, "wb") as f:
        f.write(b"\x89MCAP0\r\n")
        f.write(_mcap_record(0x01, _mcap_string(b"") + _mcap_string(b"")))
        if in_chunk:
            chunk = (struct.pack("<QQQ", 0, 0, len(recs))
                     + struct.pack("<I", 0) + _mcap_string(b"none")
                     + struct.pack("<Q", len(recs)) + recs)
            f.write(_mcap_record(0x06, chunk))
        else:
            f.write(recs)
        f.write(_mcap_record(0x02, struct.pack("<QQI", 0, 0, 0)))
        f.write(b"\x89MCAP0\r\n")


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.fixture
def clouds(rng):
    return [rng.uniform(-5, 5, (200, 3)).astype(np.float32)
            for _ in range(3)]


def test_ros1_bag_roundtrip(tmp_path, clouds):
    path = str(tmp_path / "tiny.bag")
    write_ros1_bag(path, clouds)
    ds = dataset_factory("rosbag", path, "")
    assert len(ds) == 3
    for i in range(3):
        fr = ds[i]
        np.testing.assert_allclose(fr["points"], clouds[i], rtol=1e-6)
        assert fr["sensor_ts"] == 10.0 + i
        assert "point_ts" in fr
        assert fr["point_ts"].min() == 0.0 and fr["point_ts"].max() == 1.0


def test_ros1_bag_bz2_chunk(tmp_path, clouds, rng):
    # rewrite the chunk compressed
    import bz2 as bz2m
    path = str(tmp_path / "tiny.bag")
    write_ros1_bag(path, clouds[:1])
    raw = open(path, "rb").read()
    # simplest: regenerate with bz2 by patching write — rebuild manually
    conn_data = _hdr_fields(
        topic=b"/points", type=b"sensor_msgs/PointCloud2",
        md5sum=b"0" * 32, message_definition=b"")
    records = _record(
        _hdr_fields(op=b"\x07", conn=struct.pack("<I", 0),
                    topic=b"/points"), conn_data)
    records += _record(
        _hdr_fields(op=b"\x02", conn=struct.pack("<I", 0),
                    time=struct.pack("<II", 10, 0)),
        ros1_pointcloud2(clouds[0]))
    comp = bz2m.compress(records)
    path2 = str(tmp_path / "tiny_bz2.bag")
    with open(path2, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record(_hdr_fields(
            op=b"\x05", compression=b"bz2",
            size=struct.pack("<I", len(records))), comp))
    ds = dataset_factory("rosbag", path2, "")
    np.testing.assert_allclose(ds[0]["points"], clouds[0], rtol=1e-6)


@pytest.mark.parametrize("encoding", ["cdr", "ros1"])
@pytest.mark.parametrize("in_chunk", [False, True])
def test_mcap_roundtrip(tmp_path, clouds, encoding, in_chunk):
    path = str(tmp_path / "tiny.mcap")
    write_mcap(path, clouds, encoding=encoding, in_chunk=in_chunk)
    ds = dataset_factory("mcap", path, "")
    assert len(ds) == 3
    np.testing.assert_allclose(ds[1]["points"], clouds[1], rtol=1e-6)


def test_nuscenes_schema(tmp_path, rng):
    root = tmp_path / "nusc"
    (root / "v1.0-mini").mkdir(parents=True)
    (root / "samples" / "LIDAR_TOP").mkdir(parents=True)

    def q_ident():
        return [1.0, 0.0, 0.0, 0.0]

    pts = rng.uniform(-5, 5, (100, 5)).astype(np.float32)
    rel = "samples/LIDAR_TOP/scan0.pcd.bin"
    pts.tofile(root / rel)

    tables = {
        "scene": [{"token": "sc0", "name": "scene-0001",
                   "first_sample_token": "sa0"}],
        "sample": [{"token": "sa0", "next": "", "prev": "",
                    "scene_token": "sc0"}],
        "sensor": [{"token": "se0", "channel": "LIDAR_TOP",
                    "modality": "lidar"}],
        "calibrated_sensor": [{"token": "cs0", "sensor_token": "se0",
                               "translation": [0, 0, 1.8],
                               "rotation": q_ident(),
                               "camera_intrinsic": []}],
        "ego_pose": [{"token": "ep0", "translation": [10.0, 5.0, 0.0],
                      "rotation": q_ident(), "timestamp": 1}],
        "sample_data": [{"token": "sd0", "sample_token": "sa0",
                         "ego_pose_token": "ep0",
                         "calibrated_sensor_token": "cs0",
                         "filename": rel, "is_key_frame": True,
                         "timestamp": 1000000}],
    }
    for name, rowsv in tables.items():
        with open(root / "v1.0-mini" / f"{name}.json", "w") as f:
            json.dump(rowsv, f)

    ds = dataset_factory("nuscenes", str(root), "scene-0001")
    assert len(ds) == 1
    fr = ds[0]
    np.testing.assert_allclose(fr["points"], pts[:, :3], rtol=1e-6)
    gt = ds.gt_poses()[0]
    np.testing.assert_allclose(gt[:3, 3], [10.0, 5.0, 1.8], atol=1e-6)
    np.testing.assert_allclose(fr["gt_pose"], gt)


def test_ouster_bad_inputs_raise(tmp_path):
    """The real pcap loader (tests/test_dataloaders.py exercises the
    happy path) must fail with clear errors, not crash, on garbage."""
    with pytest.raises((FileNotFoundError, OSError, ValueError)):
        dataset_factory("ouster", "/nonexistent", "")
    # a pcap with a metadata json that is valid json but not a sensor
    # info file -> ValueError from parse_metadata, not a TypeError
    p = tmp_path / "cap.pcap"
    p.write_bytes(b"\xd4\xc3\xb2\xa1" + b"\0" * 20)
    (tmp_path / "cap.json").write_text("{}")
    with pytest.raises((ValueError, FileNotFoundError)):
        dataset_factory("ouster", str(p), "")
