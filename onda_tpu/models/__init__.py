"""Flax model zoo: DeepLab-v2 family + adversarial discriminator."""

from .deeplabv2 import DeepLabV2, build_deeplab_v2  # noqa: F401
from .discriminator import FCDiscriminator  # noqa: F401
