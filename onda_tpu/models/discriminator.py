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
