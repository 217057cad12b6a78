"""Dataset layer: loaders + the SLAM frame pipeline."""

from pings_tpu.data.base import BaseDataset, dataset_factory, register_loader  # noqa: F401
