#!/usr/bin/env python3
"""Generate validation sequences in REAL dataset on-disk formats.

This environment has zero network egress, so the reference's
scripts/download_replica.sh / download_kitti_example.sh cannot run.
Instead this script ray-traces procedural worlds and writes them in the
exact formats the real loaders parse:

- Replica format (reference dataset/dataloaders/replica.py): a textured
  indoor room rendered at 1200x680 with the hardcoded Replica intrinsics
  (fx=fy=600, cx=599.5, cy=339.5), written as results/frame%06d.jpg +
  results/depth%06d.png (uint16, scale 6553.5) + traj.txt (flattened
  camera-to-world 4x4 per line).
- KITTI odometry format (reference dataset/dataloaders/kitti.py): the
  outdoor synthetic world scanned by a 64-beam spinning LiDAR, written
  as velodyne/%06d.bin (x y z intensity f32), image_2/%06d.png, calib.txt
  (P2 + Tr) and poses.txt (cam0-frame KITTI 3x4 rows).

The sequences exercise the real loader code paths end to end; metrics on
them are recorded by scripts/run_validation.py into RESULTS.md.

Usage: python scripts/make_validation_data.py [out_dir] [--frames N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pings_tpu.data.synthetic import _ray_scene, default_world  # noqa: E402
from pings_tpu.utils import pose as hp  # noqa: E402


def room_world(texture: str = "checker"):
    """Indoor world: a 10x8x3 m room shell with furniture-scale boxes
    and spheres. texture="smooth" replaces the hard 1 m checkers with
    low-frequency color fields (the SSIM texture-statistics experiment)."""
    return [
        {"kind": "box_inner", "min": np.array([-5.0, -4.0, 0.0]),
         "max": np.array([5.0, 4.0, 3.0]),
         "color1": np.array([0.75, 0.72, 0.65], np.float32),
         "color2": np.array([0.45, 0.47, 0.52], np.float32),
         "texture": texture},
        {"kind": "box", "min": np.array([1.5, -3.2, 0.0]),
         "max": np.array([3.5, -1.8, 0.9]),
         "color": np.array([0.6, 0.3, 0.2], np.float32)},
        {"kind": "box", "min": np.array([-3.5, 1.5, 0.0]),
         "max": np.array([-1.5, 3.4, 1.4]),
         "color": np.array([0.25, 0.45, 0.65], np.float32)},
        {"kind": "sphere", "center": np.array([0.0, -2.0, 0.6]),
         "radius": 0.6, "tint": 1.0},
        {"kind": "sphere", "center": np.array([-2.5, -2.5, 1.8]),
         "radius": 0.45, "tint": -1.0},
        {"kind": "box", "min": np.array([3.6, 1.8, 0.0]),
         "max": np.array([4.6, 3.6, 2.2]),
         "color": np.array([0.7, 0.65, 0.3], np.float32)},
    ]


def render_pinhole(T_w_c, K, width, height, objects):
    """Ray-cast an RGB + z-depth image for a camera-to-world pose."""
    ys, xs = np.mgrid[0:height, 0:width]
    dc = np.stack([
        (xs + 0.5 - K[0, 2]) / K[0, 0],
        (ys + 0.5 - K[1, 2]) / K[1, 1],
        np.ones_like(xs, np.float64),
    ], -1).reshape(-1, 3)
    dcn = dc / np.linalg.norm(dc, axis=1, keepdims=True)
    dw = dcn @ T_w_c[:3, :3].T
    co = np.tile(T_w_c[:3, 3], (len(dw), 1))
    t, hit, col = _ray_scene(co, dw, objects)
    img = (np.clip(col, 0, 1) * 255).astype(np.uint8).reshape(
        height, width, 3)
    z = (t * dcn[:, 2]).reshape(height, width)
    depth = np.where(hit.reshape(height, width), z, 0.0).astype(np.float32)
    return img, depth


def make_replica(out_dir: str, n_frames: int, texture: str = "checker"):
    import cv2

    name = ("replica_synth" if texture == "checker"
            else f"replica_synth_{texture}")
    seq = os.path.join(out_dir, name, "room_synth")
    res = os.path.join(seq, "results")
    os.makedirs(res, exist_ok=True)
    objects = room_world(texture)
    K = np.array([[600.0, 0, 599.5], [0, 600.0, 339.5], [0, 0, 1]])
    W, H = 1200, 680
    poses = []
    for i in range(n_frames):
        # slow orbit inside the room, looking outward-and-down slightly
        ang = 2 * np.pi * i / max(n_frames, 1) * 0.75
        eye = np.array([1.8 * np.cos(ang), 1.5 * np.sin(ang), 1.4])
        yaw = ang + np.pi / 2 * 0.6 + 0.3 * np.sin(2 * ang)
        R_wc = hp.so3_exp(np.array([0, 0, yaw])) @ \
            hp.so3_exp(np.array([0.12, 0, 0])) @ \
            np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])
        T_w_c = np.eye(4)
        T_w_c[:3, :3] = R_wc
        T_w_c[:3, 3] = eye
        poses.append(T_w_c)
        img, depth = render_pinhole(T_w_c, K, W, H, objects)
        cv2.imwrite(os.path.join(res, f"frame{i:06d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 97])
        d16 = np.clip(depth * 6553.5, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(res, f"depth{i:06d}.png"), d16)
    np.savetxt(os.path.join(seq, "traj.txt"),
               np.stack([p.reshape(-1) for p in poses]))
    print(f"replica_synth: {n_frames} frames -> {seq}")
    return seq


def street_world(length_m: float = 50.0, seed: int = 3):
    """Street-scale world for the KITTI sequence: ground plane plus
    building-like boxes and spheres scattered along BOTH sides of the
    whole trajectory. (Round-3 finding: the indoor-scale default_world
    ends at x~12.5 m, so from frame ~35 of an 80-frame 0.45 m/frame drive
    the scan saw only the unbounded ground plane — registration collapses
    on a featureless plane and the tracker rightly loses track. A
    trajectory-length world makes the full sequence meaningful.)"""
    rng = np.random.default_rng(seed)
    objs = [{"kind": "plane", "z": 0.0,
             "color1": np.array([0.55, 0.5, 0.45], np.float32),
             "color2": np.array([0.35, 0.35, 0.4], np.float32)}]
    x = -4.0
    while x < length_m:
        for side in (-1.0, 1.0):
            if rng.random() < 0.85:
                w = rng.uniform(1.5, 4.0)
                # the curving path drifts up to ~5 m laterally; keep the
                # corridor clear
                d = rng.uniform(6.5, 10.5)
                h = rng.uniform(2.0, 5.0)
                y0 = side * d
                objs.append({
                    "kind": "box",
                    "min": np.array([x, min(y0, y0 + side * 2.5), 0.0]),
                    "max": np.array([x + w, max(y0, y0 + side * 2.5), h]),
                    "color": rng.uniform(0.2, 0.85, 3).astype(np.float32),
                })
        if rng.random() < 0.4:
            side = float(rng.choice([-1.0, 1.0]))
            objs.append({
                "kind": "sphere",
                "center": np.array([x + 2.0,
                                    side * rng.uniform(6.0, 8.0), 0.8]),
                "radius": rng.uniform(0.5, 1.1),
                "tint": float(rng.choice([-1.0, 1.0]))})
        x += rng.uniform(4.0, 7.0)
    return objs


def circuit_path(n_frames: int, step: float = 1.2, A: float = 80.0,
                 R: float = 15.0, ramp_frames: int = 30):
    """Closed stadium circuit (two straights of length A joined by
    semicircular turns of radius R): total length 2A + 2*pi*R (~254 m
    with the defaults). Returns (positions (N, 2), yaws (N,)). Driving
    past one full lap revisits the start — exercising loop closure
    end-to-end and making the 100/200 m KITTI ARTE segments reachable
    (VERDICT r3 items 6 and 1).

    The vehicle accelerates from rest over ``ramp_frames`` (real KITTI
    sequences start from rest too). This is load-bearing, not cosmetic:
    jumping to full speed at frame 1 puts the whole scan ~1.2 m from the
    frame-0 map — outside the neural-point query radius — so the
    informative (travel-facing) points are invisible to registration,
    ground/walls are shift-invariant along the corridor, and "stationary"
    becomes a self-consistent local minimum the constant-velocity model
    then locks in (measured: the first circuit run tracked res=0.04,
    ratio=0.89 while never moving)."""
    total = 2.0 * A + 2.0 * np.pi * R
    speed = step * np.minimum(
        1.0, np.arange(n_frames) / max(ramp_frames, 1))
    s = np.concatenate([[0.0], np.cumsum(speed)[:-1]]) % total
    pos = np.zeros((n_frames, 2))
    yaw = np.zeros(n_frames)
    for i, si in enumerate(s):
        if si < A:                                   # straight +x at y=0
            pos[i] = [si, 0.0]
            yaw[i] = 0.0
        elif si < A + np.pi * R:                     # left turn at x=A
            a = (si - A) / R
            pos[i] = [A + R * np.sin(a), R - R * np.cos(a)]
            yaw[i] = a
        elif si < 2 * A + np.pi * R:                 # straight -x at y=2R
            pos[i] = [A - (si - A - np.pi * R), 2 * R]
            yaw[i] = np.pi
        else:                                        # left turn at x=0
            a = (si - 2 * A - np.pi * R) / R
            pos[i] = [-R * np.sin(a), R + R * np.cos(a)]
            yaw[i] = np.pi + a
    return pos, yaw


def circuit_world(A: float = 80.0, R: float = 15.0, seed: int = 4):
    """Buildings (AABBs) + spheres scattered along BOTH sides of the
    stadium circuit, corridor (path +-5.5 m) kept clear; ground plane."""
    rng = np.random.default_rng(seed)
    objs = [{"kind": "plane", "z": 0.0,
             "color1": np.array([0.55, 0.5, 0.45], np.float32),
             "color2": np.array([0.35, 0.35, 0.4], np.float32)}]
    # dense sampling along the path; boxes at lateral offsets both sides
    total = 2.0 * A + 2.0 * np.pi * R
    s = 0.0
    while s < total:
        p, y = _circuit_point(s, A, R)
        n_hat = np.array([-np.sin(y), np.cos(y)])     # left normal
        for side in (-1.0, 1.0):
            if rng.random() < 0.92:
                d = rng.uniform(7.5, 12.0)
                c = p + side * d * n_hat
                hw = rng.uniform(0.8, 2.0)
                hd = rng.uniform(0.8, 2.0)
                h = rng.uniform(2.0, 5.5)
                objs.append({
                    "kind": "box",
                    "min": np.array([c[0] - hw, c[1] - hd, 0.0]),
                    "max": np.array([c[0] + hw, c[1] + hd, h]),
                    "color": rng.uniform(0.2, 0.85, 3).astype(np.float32),
                })
        if rng.random() < 0.35:
            side = float(rng.choice([-1.0, 1.0]))
            c = p + side * rng.uniform(6.0, 8.0) * n_hat
            objs.append({
                "kind": "sphere",
                "center": np.array([c[0], c[1], 0.8]),
                "radius": rng.uniform(0.5, 1.1),
                "tint": float(rng.choice([-1.0, 1.0]))})
        s += rng.uniform(4.0, 6.5)
    return objs


def _circuit_point(s: float, A: float, R: float):
    """(x, y), yaw at arc length s of the stadium circuit."""
    total = 2.0 * A + 2.0 * np.pi * R
    s = s % total
    if s < A:
        return np.array([s, 0.0]), 0.0
    if s < A + np.pi * R:
        a = (s - A) / R
        return np.array([A + R * np.sin(a), R - R * np.cos(a)]), a
    if s < 2 * A + np.pi * R:
        return np.array([A - (s - A - np.pi * R), 2 * R]), np.pi
    a = (s - 2 * A - np.pi * R) / R
    return np.array([-R * np.sin(a), R + R * np.cos(a)]), np.pi + a


def make_kitti(out_dir: str, n_frames: int, step_m: float = 1.2):
    import cv2

    seq = os.path.join(out_dir, "kitti_synth", "00")
    os.makedirs(os.path.join(seq, "velodyne"), exist_ok=True)
    os.makedirs(os.path.join(seq, "image_2"), exist_ok=True)
    objects = circuit_world()
    rng = np.random.default_rng(0)

    # body/lidar frame: x forward, z up. cam2: x right, y down, z forward.
    T_c_l = np.eye(4)
    T_c_l[:3, :3] = np.array([[0.0, -1, 0], [0, 0, -1], [1, 0, 0]])
    T_c_l[:3, 3] = [0.05, -0.1, -0.3]
    K = np.array([[420.0, 0, 320.0], [0, 420.0, 120.0], [0, 0, 1.0]])
    W, H = 640, 240

    # closed circuit; a full lap is ~254/step frames, beyond that the
    # trajectory revisits the start (loop closure)
    pos2d, yaws = circuit_path(n_frames, step=step_m)
    poses = []
    for i in range(n_frames):
        T = np.eye(4)
        T[:3, :3] = hp.so3_exp(np.array([0, 0, yaws[i]]))
        T[:3, 3] = [pos2d[i, 0], pos2d[i, 1], 1.6]
        poses.append(T)

    el = np.radians(np.linspace(-24.8, 2.0, 64))
    az = np.linspace(-np.pi, np.pi, 1024, endpoint=False)
    AZ, EL = np.meshgrid(az, el)
    dirs_l = np.stack([np.cos(EL) * np.cos(AZ), np.cos(EL) * np.sin(AZ),
                       np.sin(EL)], -1).reshape(-1, 3)

    for i, T in enumerate(poses):
        dirs_w = dirs_l @ T[:3, :3].T
        origins = np.tile(T[:3, 3], (len(dirs_w), 1))
        t, hit, _ = _ray_scene(origins, dirs_w, objects)
        t = t + rng.normal(0, 0.008, len(t)) * hit
        keep = hit & (t < 80.0) & (t > 1.5)
        pts_l = (dirs_l[keep] * t[keep, None]).astype(np.float32)
        inten = rng.random(len(pts_l), np.float32)[:, None]
        np.concatenate([pts_l, inten], 1).astype(np.float32).tofile(
            os.path.join(seq, "velodyne", f"{i:06d}.bin"))

        T_w_c = T @ hp.se3_inv(T_c_l)
        img, _ = render_pinhole(T_w_c, K, W, H, objects)
        cv2.imwrite(os.path.join(seq, "image_2", f"{i:06d}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    # calib: P2 = K [I | 0]; Tr = cam0 <- lidar (use cam2 frame for cam0)
    P2 = np.hstack([K, np.zeros((3, 1))])
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        for name in ("P0", "P1", "P2", "P3"):
            f.write(f"{name}: " + " ".join(f"{v:.12e}"
                    for v in P2.reshape(-1)) + "\n")
        f.write("Tr: " + " ".join(f"{v:.12e}"
                for v in T_c_l[:3, :4].reshape(-1)) + "\n")
    # poses.txt: cam0-frame T_w_cam rows (KITTI convention):
    # T_cam = Tr @ T_lidar @ Tr^-1
    rows = []
    for T in poses:
        Tc = T_c_l @ T @ hp.se3_inv(T_c_l)
        rows.append(Tc[:3, :4].reshape(-1))
    np.savetxt(os.path.join(seq, "poses.txt"), np.stack(rows))
    print(f"kitti_synth: {n_frames} frames -> {seq}")
    return seq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="data_validation")
    ap.add_argument("--frames-replica", type=int, default=60)
    ap.add_argument("--frames-kitti", type=int, default=250)
    ap.add_argument("--only", choices=("replica", "kitti"), default=None)
    ap.add_argument("--texture", choices=("checker", "smooth"),
                    default="checker",
                    help="replica room texture (smooth = the SSIM "
                         "texture-statistics experiment variant)")
    args = ap.parse_args()
    if args.only in (None, "replica"):
        make_replica(args.out_dir, args.frames_replica, args.texture)
    if args.only in (None, "kitti"):
        make_kitti(args.out_dir, args.frames_kitti)


if __name__ == "__main__":
    main()
