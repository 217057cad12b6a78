"""TSDF fusion of depth maps into a voxel grid + mesh extraction.

Counterpart of the reference's Open3D ScalableTSDFVolume merged-mesh
writer (dataset/slam_dataset.py:995-1195: per-frame RGBD integration at
``tsdf_fusion_voxel_size`` with truncation, final marching-cubes mesh).
Host-side numpy fusion over a bounded grid (scenes here are SLAM-local;
the neural-SDF mesher handles large maps), native marching tetrahedra
for extraction.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class TsdfVolume:
    """Dense TSDF grid with weighted running-average integration."""

    def __init__(self, lo, hi, voxel: float, trunc: Optional[float] = None):
        self.lo = np.asarray(lo, np.float64)
        self.voxel = float(voxel)
        self.trunc = float(trunc if trunc is not None else 3.0 * voxel)
        self.shape = tuple(
            int(np.ceil((h - l) / voxel)) + 1
            for l, h in zip(self.lo, np.asarray(hi, np.float64)))
        self.tsdf = np.ones(self.shape, np.float32)
        self.weight = np.zeros(self.shape, np.float32)
        self.color = np.zeros(self.shape + (3,), np.float32)

    def integrate(self, depth: np.ndarray, K: np.ndarray,
                  T_c_w: np.ndarray, rgb: Optional[np.ndarray] = None,
                  max_weight: float = 64.0):
        """Project every voxel center into the camera; update the
        truncated projective SDF with weight 1 (reference integrates via
        o3d with the same projective model)."""
        nx, ny, nz = self.shape
        xs = self.lo[0] + self.voxel * np.arange(nx)
        ys = self.lo[1] + self.voxel * np.arange(ny)
        zs = self.lo[2] + self.voxel * np.arange(nz)
        X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
        pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
        pc = pts @ T_c_w[:3, :3].T + T_c_w[:3, 3]
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = (K[0, 0] * pc[:, 0] / z + K[0, 2]).round().astype(np.int64)
            v = (K[1, 1] * pc[:, 1] / z + K[1, 2]).round().astype(np.int64)
        h, w = depth.shape
        ok = (z > 1e-3) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        ui = np.clip(u, 0, w - 1)
        vi = np.clip(v, 0, h - 1)
        d_obs = depth[vi, ui]
        ok &= d_obs > 1e-4
        sdf = d_obs - z                       # + in front of surface
        ok &= sdf > -self.trunc               # skip far-behind voxels
        tsdf_new = np.clip(sdf / self.trunc, -1.0, 1.0)

        idx = np.nonzero(ok)[0]
        flatw = self.weight.reshape(-1)
        flatt = self.tsdf.reshape(-1)
        w_old = flatw[idx]
        w_new = np.minimum(w_old + 1.0, max_weight)
        flatt[idx] = (flatt[idx] * w_old + tsdf_new[idx]) / w_new
        flatw[idx] = w_new
        if rgb is not None:
            flatc = self.color.reshape(-1, 3)
            c_obs = rgb[vi[idx], ui[idx]].astype(np.float32)
            if c_obs.max() > 1.5:
                c_obs = c_obs / 255.0
            flatc[idx] = (flatc[idx] * w_old[:, None] + c_obs) \
                / w_new[:, None]

    def extract_mesh(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(verts, tris, colors) of the zero iso-surface over observed
        voxels."""
        from pings_tpu.native import marching_tetrahedra

        mask = self.weight > 0.5
        verts, tris = marching_tetrahedra(self.tsdf, self.lo, self.voxel,
                                          iso=0.0, mask=mask)
        if len(verts) == 0:
            return verts, tris, np.zeros((0, 3), np.float32)
        ijk = np.clip(((verts - self.lo) / self.voxel).round().astype(int),
                      0, np.array(self.shape) - 1)
        cols = self.color[ijk[:, 0], ijk[:, 1], ijk[:, 2]]
        return verts, tris, cols


def fuse_run(depths, Ks, T_c_ws, rgbs=None, voxel: float = 0.05,
             margin: float = 0.5) -> TsdfVolume:
    """Fuse a list of (depth, K, T_c_w[, rgb]) frames; grid bounds from
    the cameras' unprojected depth extents."""
    pts_all = []
    for depth, K, T_c_w in zip(depths, Ks, T_c_ws):
        h, w = depth.shape
        vs, us = np.mgrid[0:h:4, 0:w:4]
        d = depth[::4, ::4]
        ok = d > 1e-4
        x = (us + 0.5 - K[0, 2]) / K[0, 0] * d
        y = (vs + 0.5 - K[1, 2]) / K[1, 1] * d
        pc = np.stack([x[ok], y[ok], d[ok]], -1)
        T_w_c = np.linalg.inv(T_c_w)
        pts_all.append(pc @ T_w_c[:3, :3].T + T_w_c[:3, 3])
    pts = np.concatenate(pts_all)
    lo = pts.min(0) - margin
    hi = pts.max(0) + margin
    vol = TsdfVolume(lo, hi, voxel)
    for i, (depth, K, T_c_w) in enumerate(zip(depths, Ks, T_c_ws)):
        rgb = rgbs[i] if rgbs is not None else None
        vol.integrate(depth, K, T_c_w, rgb)
    return vol
