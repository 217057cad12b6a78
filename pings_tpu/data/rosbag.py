"""Streaming loaders (ROS bags / MCAP / Ouster).

Reference: dataset/dataloaders/rosbag.py (137), mcap.py (164), ouster.py
(160). The required decoder libraries (rosbags / mcap / ouster-sdk) are
not in this image; these loaders register with a clear actionable error so
``dataset_factory('rosbag', ...)`` fails with guidance instead of an
ImportError at startup.
"""

from __future__ import annotations

from pings_tpu.data.base import BaseDataset, register_loader


class _UnavailableLoader(BaseDataset):
    NEED = ""

    def __init__(self, data_path: str, sequence: str = "", cfg=None):
        raise ImportError(
            f"the '{type(self).__name__}' loader needs the optional "
            f"dependency '{self.NEED}', which is not installed in this "
            "environment. Convert the data to a point-cloud folder and use "
            "the 'generic' loader instead.")


@register_loader("rosbag")
class RosbagDataset(_UnavailableLoader):
    NEED = "rosbags"


@register_loader("mcap")
class McapDataset(_UnavailableLoader):
    NEED = "mcap"


@register_loader("ouster")
class OusterDataset(_UnavailableLoader):
    NEED = "ouster-sdk"


@register_loader("mcap_ipb_car")
class McapIpbCarDataset(_UnavailableLoader):
    NEED = "mcap"


@register_loader("nuscenes")
class NuScenesDataset(_UnavailableLoader):
    NEED = "nuscenes-devkit"
