"""DeepLab-v3 / v3+ family (ResNet-50/101 and MobileNetV2 backbones) — Flax, NHWC.

The reference vendors this zoo (reference framework/model/deeplabv3/modeling.py:114-215,
_deeplab.py, backbone/resnet.py, backbone/mobilenetv2.py) but never wires it into the
live pipeline (SURVEY.md §2.13 marks it dead/optional). Provided here for capability
parity: ASPP with image-level pooling, the v3+ decoder with low-level skip features,
and an output_stride 8/16 switch via dilated stages.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import TorchBatchNorm, conv
from ..ops.interp import upsample_bilinear_ac


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)), kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups, use_bias=False, name="conv",
        )(x)
        x = TorchBatchNorm(name="bn")(x, train, update_stats)
        return nn.relu6(x) if self.groups > 1 else nn.relu(x)


class InvertedResidual(nn.Module):
    """MobileNetV2 block (reference backbone/mobilenetv2.py)."""

    features: int
    stride: int = 1
    expand: int = 6
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        inp = x.shape[-1]
        hidden = inp * self.expand
        out = x
        if self.expand != 1:
            out = _ConvBNReLU(hidden, kernel=1, name="expand")(out, train, update_stats)
        out = _ConvBNReLU(
            hidden, kernel=3, stride=self.stride, dilation=self.dilation,
            groups=hidden, name="depthwise",
        )(out, train, update_stats)
        out = nn.Conv(self.features, (1, 1), use_bias=False, name="project")(out)
        out = TorchBatchNorm(name="project_bn")(out, train, update_stats)
        if self.stride == 1 and inp == self.features:
            out = out + x
        return out


class MobileNetV2Backbone(nn.Module):
    output_stride: int = 16

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        cfg = [  # t, c, n, s (MobileNetV2 paper)
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]
        x = _ConvBNReLU(32, stride=2, name="stem")(x, train, update_stats)
        low = None
        stride_so_far = 2
        dilation = 1
        for bi, (t, c, n, s) in enumerate(cfg):
            for i in range(n):
                stride = s if i == 0 else 1
                if stride > 1 and stride_so_far >= self.output_stride:
                    dilation *= stride
                    stride = 1
                else:
                    stride_so_far *= stride if i == 0 else 1
                x = InvertedResidual(
                    c, stride=stride, expand=t, dilation=dilation, name=f"block{bi}_{i}"
                )(x, train, update_stats)
            if bi == 1:
                low = x  # 24-ch low-level features for the v3+ decoder
        return {"out": x, "low_level": low}


class ResNetBackbone(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    output_stride: int = 16

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        from .deeplabv2 import ResLayer
        from .layers import max_pool_ceil

        if self.output_stride == 8:
            strides, dils = (1, 1), (2, 4)
        else:
            strides, dils = (2, 1), (1, 2)
        x = conv(64, 7, stride=2, padding=3, name="conv1")(x)
        x = TorchBatchNorm(name="bn1")(x, train, update_stats)
        x = nn.relu(x)
        x = max_pool_ceil(x, 3, 2, 1)
        x = ResLayer(64, self.layers[0], name="layer1")(x, train, update_stats)
        low = x  # 256-ch low-level features
        x = ResLayer(128, self.layers[1], stride=2, name="layer2")(x, train, update_stats)
        x = ResLayer(256, self.layers[2], stride=strides[0], dilation=dils[0], name="layer3")(
            x, train, update_stats
        )
        x = ResLayer(512, self.layers[3], stride=strides[1], dilation=dils[1], name="layer4")(
            x, train, update_stats
        )
        return {"out": x, "low_level": low}


class ASPPv3(nn.Module):
    """ASPP with image pooling (reference _deeplab.py ASPP)."""

    features: int = 256
    rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        branches = [_ConvBNReLU(self.features, kernel=1, name="b0")(x, train, update_stats)]
        for i, r in enumerate(self.rates, 1):
            branches.append(
                _ConvBNReLU(self.features, kernel=3, dilation=r, name=f"b{i}")(
                    x, train, update_stats
                )
            )
        pooled = x.mean(axis=(1, 2), keepdims=True)
        pooled = _ConvBNReLU(self.features, kernel=1, name="pool")(pooled, train, update_stats)
        pooled = jnp.broadcast_to(pooled, x.shape[:3] + (self.features,))
        out = jnp.concatenate(branches + [pooled], axis=-1)
        return _ConvBNReLU(self.features, kernel=1, name="proj")(out, train, update_stats)


class DeepLabV3(nn.Module):
    """v3 (plain ASPP head) or v3+ (decoder with low-level skip)."""

    num_classes: int = 19
    backbone: str = "resnet50"  # resnet50 | resnet101 | mobilenetv2
    plus: bool = True
    output_stride: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = True, dropout_rng=None):
        in_hw = x.shape[1:3]
        if self.backbone == "mobilenetv2":
            feats = MobileNetV2Backbone(self.output_stride, name="backbone")(
                x, train, update_stats
            )
        else:
            layers = (3, 4, 6, 3) if self.backbone == "resnet50" else (3, 4, 23, 3)
            feats = ResNetBackbone(layers, self.output_stride, name="backbone")(
                x, train, update_stats
            )
        out = ASPPv3(name="aspp")(feats["out"], train, update_stats)
        if self.plus:
            low = _ConvBNReLU(48, kernel=1, name="low_proj")(
                feats["low_level"], train, update_stats
            )
            out = upsample_bilinear_ac(out, low.shape[1:3])
            out = jnp.concatenate([out, low], axis=-1)
            out = _ConvBNReLU(256, kernel=3, name="fuse")(out, train, update_stats)
        logits = nn.Conv(self.num_classes, (1, 1), name="classifier")(out)
        return None, {"out": upsample_bilinear_ac(logits, in_hw), "feat": out}


def build_deeplab_v3(num_classes=19, backbone="resnet50", plus=True, output_stride=16):
    return DeepLabV3(
        num_classes=num_classes, backbone=backbone, plus=plus, output_stride=output_stride
    )
