"""Procedural synthetic LiDAR+camera dataset.

No counterpart in the reference (which ships download scripts for real
data, scripts/download_*.sh); in this zero-egress environment a procedural
world provides full-pipeline tests, demos, and benchmarks: a ground plane
with colored boxes and spheres, a circular (or straight) trajectory, an
analytically ray-cast spinning LiDAR and pinhole camera with ground truth.
"""

from __future__ import annotations

import numpy as np

from pings_tpu.data.base import BaseDataset, register_loader
from pings_tpu.utils import pose as hp


def _ray_scene(origins: np.ndarray, dirs: np.ndarray, objects):
    """Batch ray casting. Returns (t, hit, color (N,3))."""
    n = len(dirs)
    t_best = np.full(n, np.inf)
    color = np.zeros((n, 3), np.float32)
    for obj in objects:
        kind = obj["kind"]
        if kind == "plane":
            # z = height plane
            h = obj["z"]
            dz = dirs[:, 2]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (h - origins[:, 2]) / dz
            ok = (np.abs(dz) > 1e-6) & (t > 0.05)
            p = origins + dirs * t[:, None]
            if obj.get("texture") == "smooth":
                # natural-image-like low-frequency texture (for the SSIM
                # texture-statistics experiment, RESULTS.md): smooth color
                # field instead of hard 1 m checker step edges
                s = 0.5 + 0.5 * np.sin(0.9 * p[:, 0]) * np.sin(1.3 * p[:, 1])
                c = (obj["color1"] * s[:, None]
                     + obj["color2"] * (1.0 - s[:, None]))
            else:
                checker = ((np.floor(p[:, 0]) + np.floor(p[:, 1]))
                           % 2).astype(bool)
                c = np.where(checker[:, None], obj["color1"], obj["color2"])
        elif kind == "sphere":
            oc = origins - obj["center"]
            b = np.sum(dirs * oc, axis=1)
            cc = np.sum(oc * oc, axis=1) - obj["radius"] ** 2
            disc = b * b - cc
            ok = disc > 0
            t = -b - np.sqrt(np.maximum(disc, 0))
            ok &= t > 0.05
            p = origins + dirs * t[:, None]
            nrm = (p - obj["center"]) / obj["radius"]
            c = 0.5 + 0.4 * nrm * obj.get("tint", 1.0)
        elif kind == "box":
            lo = obj["min"][None]
            hi = obj["max"][None]
            with np.errstate(divide="ignore", invalid="ignore"):
                inv = 1.0 / dirs
            t0 = (lo - origins) * inv
            t1 = (hi - origins) * inv
            tmin = np.minimum(t0, t1).max(axis=1)
            tmax = np.maximum(t0, t1).min(axis=1)
            ok = (tmax > tmin) & (tmin > 0.05)
            t = tmin
            c = np.tile(obj["color"], (n, 1))
        elif kind == "box_inner":
            # inside-out AABB: the room shell. Hit = exit point (tmax);
            # walls get a 1 m checker so photometric training has texture.
            lo = obj["min"][None]
            hi = obj["max"][None]
            with np.errstate(divide="ignore", invalid="ignore"):
                inv = 1.0 / dirs
            t0 = (lo - origins) * inv
            t1 = (hi - origins) * inv
            tmax = np.maximum(t0, t1).min(axis=1)
            ok = tmax > 0.05
            t = tmax
            p = origins + dirs * t[:, None]
            if obj.get("texture") == "smooth":
                s = (0.5 + 0.5 * np.sin(0.8 * p[:, 0])
                     * np.sin(1.1 * p[:, 1]) * np.cos(0.7 * p[:, 2]))
                c = (obj["color1"] * s[:, None]
                     + obj["color2"] * (1.0 - s[:, None]))
            else:
                checker = ((np.floor(p[:, 0]) + np.floor(p[:, 1])
                            + np.floor(p[:, 2])) % 2).astype(bool)
                c = np.where(checker[:, None], obj["color1"], obj["color2"])
            # tint each wall pair differently so the room is not ambiguous
            axis = np.argmin(np.stack([
                np.minimum(np.abs(p[:, i] - lo[0, i]),
                           np.abs(p[:, i] - hi[0, i])) for i in range(3)
            ], 1), axis=1)
            tintmap = np.array([[1.0, 0.85, 0.8], [0.8, 1.0, 0.85],
                                [0.85, 0.8, 1.0]], np.float32)
            c = c * tintmap[axis]
        else:
            continue
        better = ok & (t < t_best)
        t_best = np.where(better, t, t_best)
        color = np.where(better[:, None], c.astype(np.float32), color)
    hit = np.isfinite(t_best)
    return np.where(hit, t_best, 0.0), hit, color


def default_world():
    return [
        {"kind": "plane", "z": 0.0,
         "color1": np.array([0.55, 0.5, 0.45], np.float32),
         "color2": np.array([0.35, 0.35, 0.4], np.float32)},
        {"kind": "box", "min": np.array([4.0, -6.0, 0.0]),
         "max": np.array([6.0, -4.0, 2.5]),
         "color": np.array([0.8, 0.25, 0.2], np.float32)},
        {"kind": "box", "min": np.array([8.0, 3.0, 0.0]),
         "max": np.array([10.5, 5.5, 3.5]),
         "color": np.array([0.2, 0.5, 0.8], np.float32)},
        {"kind": "sphere", "center": np.array([12.0, -2.0, 1.5]),
         "radius": 1.5, "tint": 1.0},
        {"kind": "box", "min": np.array([-6.0, -8.0, 0.0]),
         "max": np.array([-4.0, 8.0, 4.0]),
         "color": np.array([0.7, 0.65, 0.3], np.float32)},
        {"kind": "sphere", "center": np.array([0.0, 8.0, 2.0]),
         "radius": 2.0, "tint": -1.0},
    ]


@register_loader("synthetic")
class SyntheticDataset(BaseDataset):
    """sequence: '<n_frames>[:<trajectory>]' with trajectory in
    {circle, line}; data_path is ignored."""

    CAM = "cam"

    def __init__(self, data_path: str = "", sequence: str = "40:circle",
                 cfg=None, n_beams: int = 32, n_azimuth: int = 512,
                 width: int = 160, height: int = 120, seed: int = 0):
        super().__init__(data_path, sequence, cfg)
        parts = (sequence or "40:circle").split(":")
        self.n_frames = int(parts[0]) if parts[0] else 40
        self.traj = parts[1] if len(parts) > 1 else "circle"
        self.objects = default_world()
        self.n_beams = n_beams
        self.n_azimuth = n_azimuth
        self.width, self.height = width, height
        self.rng = np.random.default_rng(seed)
        self.K = np.array([[140.0, 0, width / 2],
                           [0, 140.0, height / 2],
                           [0, 0, 1]])
        # camera looks along +x of the body frame (lidar frame = body)
        self.T_c_l = np.eye(4)
        self.T_c_l[:3, :3] = np.array([[0.0, -1, 0], [0, 0, -1], [1, 0, 0]])
        self._poses = [self._pose(i) for i in range(self.n_frames)]

    def _pose(self, i: int) -> np.ndarray:
        if self.traj == "line":
            return hp.se3_exp(np.array([0.4 * i, 0, 0, 0, 0, 0])) @ \
                hp.se3_exp(np.array([0, 0, 1.2, 0, 0, 0]))
        # circle of radius 6 around (3, 0)
        ang = 2 * np.pi * i / max(self.n_frames, 1)
        T = np.eye(4)
        T[:3, :3] = hp.so3_exp(np.array([0, 0, ang + np.pi / 2]))
        T[:3, 3] = [3 + 6 * np.cos(ang), 6 * np.sin(ang), 1.2]
        return T

    def __len__(self):
        return self.n_frames

    @property
    def cam_names(self):
        return [self.CAM]

    def gt_poses(self):
        return [p.copy() for p in self._poses]

    def _lidar_dirs(self):
        el = np.radians(np.linspace(-25, 15, self.n_beams))
        az = np.linspace(-np.pi, np.pi, self.n_azimuth, endpoint=False)
        AZ, EL = np.meshgrid(az, el)
        d = np.stack([np.cos(EL) * np.cos(AZ), np.cos(EL) * np.sin(AZ),
                      np.sin(EL)], -1).reshape(-1, 3)
        ts = ((AZ.reshape(-1) + np.pi) / (2 * np.pi)).astype(np.float32)
        return d.astype(np.float64), ts

    def __getitem__(self, idx: int) -> dict:
        T = self._poses[idx]
        dirs_l, point_ts = self._lidar_dirs()
        dirs_w = dirs_l @ T[:3, :3].T
        origins = np.tile(T[:3, 3], (len(dirs_w), 1))
        t, hit, _ = _ray_scene(origins, dirs_w, self.objects)
        rng_noise = self.rng.normal(0, 0.01, len(t))
        t_noisy = t + rng_noise * hit
        pts_l = (dirs_l * t_noisy[:, None]).astype(np.float32)

        # camera image by ray casting through pixels
        T_c_w = self.T_c_l @ hp.se3_inv(T)
        T_w_c = hp.se3_inv(T_c_w)
        ys, xs = np.mgrid[0:self.height, 0:self.width]
        dc = np.stack([
            (xs + 0.5 - self.K[0, 2]) / self.K[0, 0],
            (ys + 0.5 - self.K[1, 2]) / self.K[1, 1],
            np.ones_like(xs, np.float64),
        ], -1).reshape(-1, 3)
        dcn = dc / np.linalg.norm(dc, axis=1, keepdims=True)
        dw = dcn @ T_w_c[:3, :3].T
        co = np.tile(T_w_c[:3, 3], (len(dw), 1))
        tc, chit, col = _ray_scene(co, dw, self.objects)
        img = (np.clip(col, 0, 1) * 255).astype(np.uint8).reshape(
            self.height, self.width, 3)
        zdepth = (tc * dcn[:, 2] / 1.0).reshape(self.height, self.width)
        depth = np.where(chit.reshape(self.height, self.width),
                         zdepth, 0.0).astype(np.float32)
        sky = (~chit).reshape(self.height, self.width).astype(np.float32)

        return {
            "points": pts_l[hit],
            "point_ts": point_ts[hit],
            "img": {self.CAM: img},
            "depth": {self.CAM: depth},
            "sky": {self.CAM: sky},
            "K": {self.CAM: self.K},
            "T_c_l": {self.CAM: self.T_c_l},
            "gt_pose": T.copy(),
            "sensor_ts": float(idx) * 0.1,
        }
