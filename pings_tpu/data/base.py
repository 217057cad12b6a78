"""Dataset loader interface and factory.

Reference: dataset/dataloaders/__init__.py:61-84 — ``dataset_factory``
introspects a loader module's single class. Here loaders self-register by
name; each yields per-frame dicts with the same contract as the reference
(dataset/slam_dataset.py:261-295):

    {
      "points":     (N, 3) or (N, 6) float32 — LiDAR points (sensor frame,
                    cols 3:6 = rgb if colored),
      "point_ts":   (N,) float32 in [0, 1] — per-point normalized sweep
                    time (optional),
      "img":        {cam_name: (H, W, 3) uint8} (optional),
      "depth":      {cam_name: (H, W) float32 meters} (optional),
      "sky":        {cam_name: (H, W) float32 1=sky} (optional),
      "K":          {cam_name: (3, 3) float64} (static per dataset),
      "T_c_l":      {cam_name: (4, 4) float64} camera-from-lidar extrinsics,
      "gt_pose":    (4, 4) float64 (optional),
      "sensor_ts":  float (optional),
    }
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional

_REGISTRY: Dict[str, Callable] = {}


def register_loader(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


class BaseDataset:
    """Loader interface: random access to frames."""

    def __init__(self, data_path: str, sequence: str = "", cfg=None):
        self.data_path = data_path
        self.sequence = sequence
        self.cfg = cfg

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> dict:
        raise NotImplementedError

    @property
    def cam_names(self):
        return []

    def gt_poses(self):
        """Optional list of (4,4) ground-truth poses (lidar frame)."""
        return None


def dataset_factory(name: str, data_path: str, sequence: str = "",
                    cfg=None) -> BaseDataset:
    _import_loader_modules()

    if name not in _REGISTRY:
        raise KeyError(
            f"unknown dataset loader '{name}'; available: "
            f"{sorted(_REGISTRY)}")
    return _REGISTRY[name](data_path, sequence, cfg)


def _import_loader_modules():
    """Import loader modules lazily so optional deps don't break the
    package."""
    import pings_tpu.data.generic  # noqa: F401
    import pings_tpu.data.kitti  # noqa: F401
    import pings_tpu.data.kitti360  # noqa: F401
    import pings_tpu.data.lidar  # noqa: F401
    import pings_tpu.data.ouster  # noqa: F401
    import pings_tpu.data.raw_formats  # noqa: F401
    import pings_tpu.data.rgbd  # noqa: F401
    import pings_tpu.data.rosbag  # noqa: F401
    import pings_tpu.data.synthetic  # noqa: F401


def available_loaders():
    _import_loader_modules()
    return sorted(_REGISTRY)
