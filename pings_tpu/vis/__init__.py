from pings_tpu.vis.packet import VisPacket
from pings_tpu.vis.viewer import write_viewer

__all__ = ["VisPacket", "write_viewer"]
