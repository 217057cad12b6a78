"""RGB-D dataset loaders: Replica, TUM, NeuralRGBD/Bonn-style.

Reference: dataset/dataloaders/replica.py (127; depth scale 6553.5,
hardcoded intrinsics replica.py:55-87), tum.py, neuralrgbd.py, bonn.py.
RGB-D frames are converted to the LiDAR-frame contract by back-projecting
the depth map into a point cloud (the reference does the same: RGB-D mode
feeds unprojected depth as the "scan").
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np

from pings_tpu.data.base import BaseDataset, register_loader
from pings_tpu.eval.traj import read_kitti_poses, read_tum_poses


def backproject(depth: np.ndarray, K: np.ndarray, stride: int = 1):
    h, w = depth.shape
    ys, xs = np.mgrid[0:h:stride, 0:w:stride]
    d = depth[::stride, ::stride]
    ok = d > 1e-4
    x = (xs + 0.5 - K[0, 2]) / K[0, 0] * d
    y = (ys + 0.5 - K[1, 2]) / K[1, 1] * d
    pts = np.stack([x[ok], y[ok], d[ok]], -1).astype(np.float32)
    return pts, (ys[ok], xs[ok])


class _RGBDBase(BaseDataset):
    """Common RGB-D logic; subclasses set file lists, K, depth scale."""

    CAM = "cam"
    depth_scale = 1000.0
    K: np.ndarray

    rgb_files: List[str]
    depth_files: List[str]

    def __len__(self):
        return min(len(self.rgb_files), len(self.depth_files))

    @property
    def cam_names(self):
        return [self.CAM]

    def __getitem__(self, idx: int) -> dict:
        import cv2

        img = cv2.cvtColor(cv2.imread(self.rgb_files[idx]),
                           cv2.COLOR_BGR2RGB)
        depth_raw = cv2.imread(self.depth_files[idx], cv2.IMREAD_UNCHANGED)
        depth = depth_raw.astype(np.float32) / self.depth_scale
        stride = 2 if depth.size > 400000 else 1
        pts, (pys, pxs) = backproject(depth, self.K, stride=stride)
        rgb = img[pys, pxs].astype(np.float32) / 255.0
        out = {
            "points": np.concatenate([pts, rgb], axis=1),
            "img": {self.CAM: img},
            "depth": {self.CAM: depth},
            "K": {self.CAM: self.K},
            "T_c_l": {self.CAM: np.eye(4)},
        }
        if self._gt is not None and idx < len(self._gt):
            out["gt_pose"] = self._gt[idx]
        return out

    def gt_poses(self):
        return self._gt


@register_loader("replica")
class ReplicaDataset(_RGBDBase):
    """Replica SLAM sequences (reference replica.py: K hardcoded
    :55-87, depth scale 6553.5)."""

    depth_scale = 6553.5

    def __init__(self, data_path: str, sequence: str = "room0", cfg=None):
        super().__init__(data_path, sequence, cfg)
        root = os.path.join(data_path, sequence)
        if not os.path.isdir(root):
            root = data_path
        res_dir = os.path.join(root, "results")
        if not os.path.isdir(res_dir):
            res_dir = root
        self.rgb_files = sorted(glob.glob(os.path.join(res_dir, "frame*.jpg"))
                                or glob.glob(os.path.join(res_dir, "rgb*.png")))
        self.depth_files = sorted(glob.glob(os.path.join(res_dir, "depth*.png")))
        # Replica camera (reference replica.py:55-87)
        self.K = np.array([[600.0, 0, 599.5], [0, 600.0, 339.5], [0, 0, 1]])
        self._gt = None
        traj = os.path.join(root, "traj.txt")
        if os.path.exists(traj):
            raw = np.loadtxt(traj).reshape(-1, 4, 4)
            self._gt = [raw[i] for i in range(len(raw))]


@register_loader("tum")
class TumDataset(_RGBDBase):
    """TUM RGB-D (reference tum.py): rgb.txt/depth.txt association by
    nearest timestamp; freiburg intrinsic presets."""

    depth_scale = 5000.0
    PRESETS = {
        "freiburg1": np.array([[517.3, 0, 318.6], [0, 516.5, 255.3], [0, 0, 1]]),
        "freiburg2": np.array([[520.9, 0, 325.1], [0, 521.0, 249.7], [0, 0, 1]]),
        "freiburg3": np.array([[535.4, 0, 320.1], [0, 539.2, 247.6], [0, 0, 1]]),
    }

    def __init__(self, data_path: str, sequence: str = "", cfg=None):
        super().__init__(data_path, sequence, cfg)
        root = os.path.join(data_path, sequence) if sequence else data_path
        self.K = self.PRESETS["freiburg1"]
        for name, K in self.PRESETS.items():
            if name in root:
                self.K = K
        rgb_list = self._read_list(os.path.join(root, "rgb.txt"))
        depth_list = self._read_list(os.path.join(root, "depth.txt"))
        # associate by nearest timestamp (<= 20 ms)
        self.rgb_files, self.depth_files = [], []
        ts_gt: List[float] = []
        d_ts = np.array([t for t, _ in depth_list])
        for t, f in rgb_list:
            i = int(np.argmin(np.abs(d_ts - t)))
            if abs(d_ts[i] - t) < 0.02:
                self.rgb_files.append(os.path.join(root, f))
                self.depth_files.append(os.path.join(root, depth_list[i][1]))
                ts_gt.append(t)
        self._gt = None
        gt_file = os.path.join(root, "groundtruth.txt")
        if os.path.exists(gt_file):
            poses, pts = read_tum_poses(gt_file)
            pts_arr = np.array(pts)
            self._gt = [poses[int(np.argmin(np.abs(pts_arr - t)))]
                        for t in ts_gt]

    @staticmethod
    def _read_list(path: str):
        out = []
        with open(path) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                parts = line.split()
                if len(parts) >= 2:
                    out.append((float(parts[0]), parts[1]))
        return out


@register_loader("bonn")
class BonnDataset(TumDataset):
    """Bonn dynamic RGB-D (reference bonn.py): TUM layout with depth
    scale 5000 and fixed intrinsics."""

    def __init__(self, data_path: str, sequence: str = "", cfg=None):
        super().__init__(data_path, sequence, cfg)
        # reference bonn.py fixed camera
        self.K = np.array([[542.822841, 0, 315.593520],
                           [0, 542.576870, 237.756098], [0, 0, 1]])


@register_loader("azure")
class AzureDataset(_RGBDBase):
    """Azure Kinect captures (reference azure.py): color/*.jpg +
    depth/*.png + intrinsic/intrinsic_color.txt + pose/*.txt."""

    depth_scale = 1000.0

    def __init__(self, data_path: str, sequence: str = "", cfg=None):
        super().__init__(data_path, sequence, cfg)
        root = os.path.join(data_path, sequence) if sequence else data_path
        self.rgb_files = sorted(
            glob.glob(os.path.join(root, "color", "*.jpg"))
            or glob.glob(os.path.join(root, "color", "*.png")))
        self.depth_files = sorted(
            glob.glob(os.path.join(root, "depth", "*.png")))
        intr = os.path.join(root, "intrinsic", "intrinsic_color.txt")
        if os.path.exists(intr):
            self.K = np.loadtxt(intr)[:3, :3]
        else:
            import cv2

            h, w = cv2.imread(self.depth_files[0],
                              cv2.IMREAD_UNCHANGED).shape[:2]
            self.K = np.array([[550.0, 0, w / 2], [0, 550.0, h / 2],
                               [0, 0, 1]])
        self._gt = None
        pose_files = sorted(glob.glob(os.path.join(root, "pose", "*.txt")))
        if pose_files:
            self._gt = [np.loadtxt(f).reshape(4, 4) for f in pose_files]


@register_loader("neuralrgbd")
class NeuralRGBDDataset(_RGBDBase):
    """NeuralRGBD / Bonn-style layout (reference neuralrgbd.py): images/
    + depth/ (or depth_filtered/), focal.txt, poses.txt (kitti 4x4)."""

    depth_scale = 1000.0

    def __init__(self, data_path: str, sequence: str = "", cfg=None):
        super().__init__(data_path, sequence, cfg)
        root = os.path.join(data_path, sequence) if sequence else data_path
        self.rgb_files = sorted(
            glob.glob(os.path.join(root, "images", "*.png"))
            or glob.glob(os.path.join(root, "rgb", "*.png")))
        self.depth_files = sorted(
            glob.glob(os.path.join(root, "depth_filtered", "*.png"))
            or glob.glob(os.path.join(root, "depth", "*.png")))
        focal_file = os.path.join(root, "focal.txt")
        focal = float(open(focal_file).read().split()[0]) \
            if os.path.exists(focal_file) else 554.0
        import cv2

        h, w = cv2.imread(self.depth_files[0], cv2.IMREAD_UNCHANGED).shape[:2]
        self.K = np.array([[focal, 0, w / 2 - 0.5],
                           [0, focal, h / 2 - 0.5], [0, 0, 1]])
        self._gt = None
        pose_file = os.path.join(root, "poses.txt")
        if os.path.exists(pose_file):
            self._gt = read_kitti_poses(pose_file)
