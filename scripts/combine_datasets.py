#!/usr/bin/env python3
"""Concatenate two dataset folders (e.g. train + val) into one sequence.

Framework-native counterpart of the reference combine_datasets.sh
(reference root): per-frame modality directories are merged with the
second dataset's frames renumbered to continue after the first; pose /
timestamp line files are concatenated with the same ordering; an
optional stride thins both while combining.

Frame files must share a sortable numeric stem (e.g. 000123.png); the
combined files are renamed to a contiguous 6-digit index so every
loader's sort order matches the pose file line order.

Usage:
    python scripts/combine_datasets.py <a_dir> <b_dir> [-o OUT] [--stride K]
"""

import argparse
import os
import shutil
import sys

IMG_EXT = {".png", ".jpg", ".jpeg"}
PCD_EXT = {".bin", ".ply", ".pcd", ".npy", ".las"}
PER_FRAME_FILES = {"poses.txt", "timestamps.txt", "times.txt",
                   "poses_kitti.txt", "trajectory.txt"}


def frame_dirs(root):
    """modality-dir relpath -> sorted file list (leaf dirs of frames)."""
    out = {}
    for cur, _, files in os.walk(root):
        fs = sorted(f for f in files
                    if os.path.splitext(f)[1].lower() in IMG_EXT | PCD_EXT)
        if len(fs) > 4:
            out[os.path.relpath(cur, root)] = fs
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("a_dir")
    ap.add_argument("b_dir")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--stride", type=int, default=1)
    args = ap.parse_args()
    a, b = args.a_dir.rstrip("/"), args.b_dir.rstrip("/")
    out_root = args.out or f"{a}_combined"
    if os.path.exists(out_root):
        sys.exit(f"{out_root} already exists")

    fa, fb = frame_dirs(a), frame_dirs(b)
    shared = sorted(set(fa) & set(fb))
    if not shared:
        sys.exit("datasets share no per-frame modality directories")
    only = sorted(set(fa) ^ set(fb))
    if only:
        print(f"warning: unpaired modality dirs skipped: {only}")

    for rel in shared:
        dst = os.path.join(out_root, rel)
        os.makedirs(dst, exist_ok=True)
        idx = 0
        for root, files in ((a, fa[rel]), (b, fb[rel])):
            for i, f in enumerate(files):
                if i % args.stride:
                    continue
                ext = os.path.splitext(f)[1].lower()
                shutil.copy2(os.path.join(root, rel, f),
                             os.path.join(dst, f"{idx:06d}{ext}"))
                idx += 1
        print(f"  {rel}: {idx} frames")

    # concat per-frame line files present in both roots
    for name in PER_FRAME_FILES:
        sa, sb = os.path.join(a, name), os.path.join(b, name)
        if os.path.isfile(sa) and os.path.isfile(sb):
            with open(os.path.join(out_root, name), "w") as out:
                for s in (sa, sb):
                    with open(s) as f:
                        body = [ln for ln in f if not ln.startswith("#")]
                    out.writelines(body[::args.stride])
            print(f"  {name}: concatenated")

    # calibration and other metadata: take dataset A's copy
    for f in os.listdir(a):
        src = os.path.join(a, f)
        if os.path.isfile(src) and f not in PER_FRAME_FILES:
            shutil.copy2(src, os.path.join(out_root, f))
    print(f"wrote {out_root}")


if __name__ == "__main__":
    main()
