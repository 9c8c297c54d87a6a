"""Fully-convolutional discriminator for the ADVENT baseline.

Parity with reference framework/model/discriminator.py:4-15: five 4×4 stride-2
convs (C→64→128→256→512→1) with LeakyReLU(0.2) between — a 1-logit map over
entropy images. NHWC.
"""

from __future__ import annotations

import flax.linen as nn

from .layers import conv


class FCDiscriminator(nn.Module):
    ndf: int = 64

    @nn.compact
    def __call__(self, x):
        for i, mult in enumerate((1, 2, 4, 8)):
            x = conv(self.ndf * mult, 4, stride=2, padding=1, use_bias=True, name=f"conv{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        return conv(1, 4, stride=2, padding=1, use_bias=True, name="conv4")(x)


class DCGANDiscriminator(nn.Module):
    """DCGAN-style discriminator (reference discriminator.py:18-38 — unused by the
    live pipeline; provided for capability parity). BN between conv stages,
    sigmoid output."""

    ndf: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = True):
        from .layers import TorchBatchNorm

        x = conv(self.ndf, 4, stride=2, padding=1, name="conv0")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        for i, mult in enumerate((2, 4, 8), start=1):
            x = conv(self.ndf * mult, 4, stride=2, padding=1, name=f"conv{i}")(x)
            x = TorchBatchNorm(name=f"bn{i}")(x, train, update_stats)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = conv(1, 4, stride=1, padding=0, name="conv4")(x)
        return nn.sigmoid(x)
