"""Data layer: metadata tables, segmentation dataset, replay buffer, device prefetch."""

from .segmentation import LabelMapper, SegmentationDataset, normalize_image  # noqa: F401
from .loader import Loader, DeviceFeeder  # noqa: F401
from .replay_buffer import ReplayBuffer  # noqa: F401
