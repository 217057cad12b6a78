"""Per-frame preprocessing: crop, downsample, deskew, camera projection.

Reference: dataset/slam_dataset.py — ``preprocess_frame`` (:506-688):
constant-velocity initial guess, range crop, voxel downsample of the map
input and a coarser downsample of the tracker source, pre-deskew with the
last relative motion; ``update_odom_pose`` (:691-773): pose bookkeeping,
travel distance, stop detection, lose-track abort;
``project_pointcloud_to_cams`` (:803-857): colorize scan + min-depth maps.

Device work (crop/downsample/deskew/projection) runs in jitted ops with
scans padded to power-of-two buckets to bound recompilation.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pings_tpu.ops import transforms as tf
from pings_tpu.utils import pose as hp


def pad_pow2(pts: np.ndarray, min_size: int = 4096):
    """Pad to the next power-of-two length; returns (padded, mask)."""
    n = len(pts)
    size = max(min_size, 1 << int(np.ceil(np.log2(max(n, 1)))))
    pad = size - n
    out = np.zeros((size,) + pts.shape[1:], pts.dtype)
    out[:n] = pts
    mask = np.zeros(size, bool)
    mask[:n] = True
    return out, mask


class PreprocessedFrame:
    def __init__(self):
        self.points_l: np.ndarray = None       # (P, 3) padded, sensor frame
        self.colors: np.ndarray = None         # (P, 3)
        self.mask: np.ndarray = None           # (P,)
        self.point_ts: Optional[np.ndarray] = None
        self.sem: Optional[np.ndarray] = None  # (P,) i32 class ids; -1 = none
        self.source_points: np.ndarray = None  # (S, 3) tracker source
        self.source_mask: np.ndarray = None
        self.source_intensity: np.ndarray = None  # (S,) [0,1]; -1 = none
        self.cams: Dict[str, dict] = {}
        self.gt_pose: Optional[np.ndarray] = None
        self.raw: dict = None


def preprocess_frame(frame: dict, cfg, T_rel_last: np.ndarray,
                     deskew_on: bool) -> PreprocessedFrame:
    out = PreprocessedFrame()
    out.raw = frame
    pts = np.asarray(frame["points"], np.float32)
    colors = pts[:, 3:6] if pts.shape[1] >= 6 else np.zeros_like(pts[:, :3])
    pts = pts[:, :3]
    ts = frame.get("point_ts")

    pts_p, mask = pad_pow2(pts)
    colors_p, _ = pad_pow2(colors)
    jp = jnp.asarray(pts_p)
    jm = jnp.asarray(mask)
    jm &= tf.crop_range_mask(jp, cfg.min_range, cfg.max_range,
                             cfg.min_z, cfg.max_z)
    if deskew_on and ts is not None and len(ts):
        ts_np = np.asarray(ts, np.float32).copy()
        lidar_idx = frame.get("point_lidar_idx")
        if lidar_idx is not None and len(lidar_idx):
            # multi-LiDAR: each sensor sweeps on its own clock — normalize
            # timestamps per sensor so one relative-motion slerp
            # compensates all of them (reference deskewing multi-LiDAR
            # branch, utils/tools.py:1126-1156)
            li = np.asarray(lidar_idx).reshape(-1)
            for s_id in np.unique(li):
                sel = li == s_id
                t0, t1 = ts_np[sel].min(), ts_np[sel].max()
                if t1 > t0:
                    ts_np[sel] = (ts_np[sel] - t0) / (t1 - t0)
        ts_p, _ = pad_pow2(ts_np)
        jp = tf.deskew(jp, jnp.asarray(ts_p),
                       jnp.asarray(T_rel_last, jnp.float32))
    if cfg.rand_downsample:
        # random downsampling instead of voxel (reference rand_downsample
        # + rand_down_r, utils/config.py process section): keep each
        # point with probability rand_down_r
        rng_ds = np.random.default_rng(cfg.seed + pts.shape[0])
        keep_map = jm & jnp.asarray(
            rng_ds.random(jp.shape[0]) < cfg.rand_down_r)
    else:
        keep_map = tf.voxel_down_sample_mask(jp, jm, cfg.vox_down_m)
    keep_src = tf.voxel_down_sample_mask(jp, jm, cfg.source_vox_down_m)

    out.points_l = np.asarray(jp)
    out.colors = colors_p
    out.mask = np.asarray(keep_map)
    out.point_ts = ts
    sem = frame.get("sem")
    if sem is not None and len(sem):
        sem_p, _ = pad_pow2(np.asarray(sem, np.int32).reshape(-1))
        out.sem = sem_p.astype(np.int32)

    src_idx = np.nonzero(np.asarray(keep_src))[0]
    if len(src_idx) > cfg.source_max_count:
        src_idx = src_idx[:: len(src_idx) // cfg.source_max_count + 1]
    src = out.points_l[src_idx]
    src_p, src_m = pad_pow2(src, min_size=1024)
    out.source_points = src_p
    out.source_mask = src_m
    # per-source-point intensity for photometric registration (reference
    # implicit_color_reg, tracker.py:692-737); -1 = no color measurement
    src_col = out.colors[src_idx]
    inten = np.where(np.any(src_col > 0, axis=-1),
                     src_col.mean(axis=-1), -1.0).astype(np.float32)
    out.source_intensity, _ = pad_pow2(inten, min_size=1024)
    out.source_intensity[~src_m] = -1.0

    for cam in frame.get("img", {}):
        out.cams[cam] = {
            "img": frame["img"][cam],
            "depth": frame.get("depth", {}).get(cam),
            "sky": frame.get("sky", {}).get(cam),
            "K": frame["K"][cam],
            "T_c_l": frame["T_c_l"][cam],
            # fraction of a frame period between this camera's shutter and
            # the LiDAR sweep reference time (reference per-camera
            # timestamp slerp, slam_dataset.py:821-836); 0 = synchronized
            "ts_frac": frame.get("cam_ts_frac", {}).get(cam, 0.0),
        }
    if "gt_pose" in frame:
        out.gt_pose = np.asarray(frame["gt_pose"], np.float64)
    return out


def project_scan_to_cam(points_w: np.ndarray, mask: np.ndarray,
                        T_c_w: np.ndarray, K: np.ndarray,
                        width: int, height: int) -> np.ndarray:
    """LiDAR depth map for a camera (min-depth splat)."""
    uv, z, valid = tf.project_points_to_cam(
        jnp.asarray(points_w), jnp.asarray(mask),
        jnp.asarray(T_c_w, jnp.float32), jnp.asarray(K, jnp.float32),
        width, height)
    dm = tf.splat_depth_map(uv, z, valid, width, height)
    return np.asarray(dm)


def colorize_scan(points_w: np.ndarray, mask: np.ndarray,
                  T_c_w: np.ndarray, K: np.ndarray,
                  image: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Sample image color at projected scan points
    (reference project_pointcloud_to_cams, slam_dataset.py:803-857)."""
    h, w = image.shape[:2]
    uv, z, valid = tf.project_points_to_cam(
        jnp.asarray(points_w), jnp.asarray(mask),
        jnp.asarray(T_c_w, jnp.float32), jnp.asarray(K, jnp.float32), w, h)
    img = jnp.asarray(image, jnp.float32) / 255.0
    colors, cvalid = tf.colorize_points(uv, valid, img)
    return np.asarray(colors), np.asarray(cvalid)
