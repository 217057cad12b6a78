"""Core tensor ops: transforms, hashing, downsampling, rasterization, SSIM."""

from pings_tpu.ops import transforms  # noqa: F401
