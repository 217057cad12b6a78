#!/usr/bin/env python3
"""Temporally downsample a generic dataset folder.

Framework-native counterpart of the reference downsample_dataset.sh
(reference root): keep every k-th frame of each per-frame modality
(images, point clouds, depth maps) and subsample line-oriented per-frame
files (poses, timestamps) with the same stride, writing a new sibling
dataset directory named <src>_ds<cam>_<lidar>.

Camera and LiDAR strides may differ (camera-heavy datasets are often
thinned harder). Directory classification is by file extension:
image dirs (.png/.jpg/.jpeg) use the camera stride, point-cloud dirs
(.bin/.ply/.pcd/.npy/.las) the lidar stride; everything else is copied
verbatim.

Usage:
    python scripts/downsample_dataset.py <dataset_dir> <cam_stride> [lidar_stride]
"""

import argparse
import os
import shutil
import sys

IMG_EXT = {".png", ".jpg", ".jpeg"}
PCD_EXT = {".bin", ".ply", ".pcd", ".npy", ".las"}
PER_FRAME_FILES = {"poses.txt", "timestamps.txt", "times.txt",
                   "poses_kitti.txt", "trajectory.txt"}


def classify(files):
    exts = {os.path.splitext(f)[1].lower() for f in files}
    if exts & IMG_EXT and not exts - IMG_EXT:
        return "cam"
    if exts & PCD_EXT and not exts - PCD_EXT:
        return "lidar"
    return "other"


def downsample_dir(src, dst, stride):
    os.makedirs(dst, exist_ok=True)
    files = sorted(os.listdir(src))
    kept = 0
    for i, f in enumerate(files):
        if i % stride == 0:
            shutil.copy2(os.path.join(src, f), os.path.join(dst, f))
            kept += 1
    return kept, len(files)


def downsample_lines(src, dst, stride):
    with open(src) as f:
        lines = f.readlines()
    head = [ln for ln in lines if ln.startswith("#")]
    body = [ln for ln in lines if not ln.startswith("#")]
    with open(dst, "w") as f:
        f.writelines(head + body[::stride])


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("dataset_dir")
    ap.add_argument("cam_stride", type=int)
    ap.add_argument("lidar_stride", type=int, nargs="?", default=None)
    args = ap.parse_args()
    cam_s = args.cam_stride
    lid_s = args.lidar_stride or cam_s
    if cam_s < 1 or lid_s < 1:
        sys.exit("strides must be >= 1")

    src_root = args.dataset_dir.rstrip("/")
    dst_root = f"{src_root}_ds{cam_s}_{lid_s}"
    if os.path.exists(dst_root):
        sys.exit(f"{dst_root} already exists")
    os.makedirs(dst_root)

    for cur, dirs, files in os.walk(src_root):
        rel = os.path.relpath(cur, src_root)
        out = os.path.join(dst_root, rel) if rel != "." else dst_root
        subfiles = [f for f in files]
        kind = classify(subfiles) if subfiles else "other"
        if kind in ("cam", "lidar") and len(subfiles) > 4:
            stride = cam_s if kind == "cam" else lid_s
            dirs[:] = []  # leaf modality dir: no recursion below
            kept, total = downsample_dir(cur, out, stride)
            print(f"  {rel}: {kind} x{stride} -> kept {kept}/{total}")
        else:
            os.makedirs(out, exist_ok=True)
            for f in subfiles:
                s, d = os.path.join(cur, f), os.path.join(out, f)
                if f in PER_FRAME_FILES:
                    # per-frame line files follow the lidar stride (the
                    # frame master clock in every supported loader)
                    downsample_lines(s, d, lid_s)
                    print(f"  {os.path.join(rel, f)}: lines x{lid_s}")
                else:
                    shutil.copy2(s, d)
    print(f"wrote {dst_root}")


if __name__ == "__main__":
    main()
