"""DeepLab-v2 (dilated ResNet-50/101, stride 8) with ASPP / ProDA heads — Flax, NHWC.

Architecture parity with the reference models (same layer geometry, so torch
checkpoints import weight-for-weight):

* dilated ResNet backbone — reference framework/model/deeplabv2.py:260-395
  (Bottleneck stack; dilation 2/4 in layers 3/4; stride-8 output; maxpool
  ceil_mode; BN affine params frozen for training via the optimizer mask, see
  methods/optim.py)
* classic ASPP head `ClassifierModule` — reference deeplabv2.py:71-95
* ProDA head `Classifier_Module2` (ASPP → concat → SE → bottleneck → GroupNorm →
  Dropout2d → 1×1) returning {"feat","out"} — reference deeplabv2.py:117-257
* optional aux head on layer3 features when multi_level — reference deeplabv2.py:321-325
* GroupNorm backbone variant (`DeepLabv2-Resnet50-GN`) — reference model_handler.py:31-40
* Microsoft ProDA layout (`DeepLabv2-Resnet101-ProDA`, reference
  deeplabv2_proda.py:310-419,499-529): same Bottleneck/backbone geometry
  (conv1-stride, dilation 2/4, identical downsample condition), head at
  `layer5`, optional bn_clr `bn_pretrain` BatchNorm(2048) before the head —
  `proda_layout=True` reproduces the checkpoint key layout exactly.

Design notes (TPU): NHWC everywhere; all convs carry explicit torch-style padding
so shapes match the reference's at every resolution (the 1/8+1 output grid,
e.g. 512×1024 → 65×129, is load-bearing for the prototype pipeline).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import TorchBatchNorm, TorchGroupNorm, conv, dropout2d, max_pool_ceil


class Bottleneck(nn.Module):
    """ResNet bottleneck (reference deeplabv2.py:7-68): stride on conv1, dilated conv2."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    norm: Any = TorchBatchNorm
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = True):
        residual = x
        out = conv(self.planes, 1, stride=self.stride, name="conv1", dtype=self.dtype)(x)
        out = self.norm(name="bn1")(out, train, update_stats)
        out = nn.relu(out)
        out = conv(
            self.planes, 3, padding=self.dilation, dilation=self.dilation, name="conv2",
            dtype=self.dtype,
        )(out)
        out = self.norm(name="bn2")(out, train, update_stats)
        out = nn.relu(out)
        out = conv(self.planes * 4, 1, name="conv3", dtype=self.dtype)(out)
        out = self.norm(name="bn3")(out, train, update_stats)
        if self.has_downsample:
            residual = conv(self.planes * 4, 1, stride=self.stride, name="downsample_conv",
                            dtype=self.dtype)(x)
            residual = self.norm(name="downsample_bn")(residual, train, update_stats)
        return nn.relu(out + residual)


class ResLayer(nn.Module):
    """A stage of bottlenecks (reference _make_layer, deeplabv2.py:333-373)."""

    planes: int
    blocks: int
    stride: int = 1
    dilation: int = 1
    norm: Any = TorchBatchNorm
    dtype: Any = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = True):
        # remat=True checkpoints each bottleneck (nn.remat): the backward
        # recomputes one block at a time, so only a block's activations are
        # ever live — whole-model jax.checkpoint does NOT shrink the peak
        # (measured: f32 512x1024 b8 still allocates 20.5G because the full
        # recompute holds every layer4 buffer at once).
        block = (
            nn.remat(Bottleneck, static_argnums=(2, 3)) if self.remat else Bottleneck
        )
        # first block downsamples iff stride != 1, channel change, or dilation 2/4 —
        # for these stages that is always (reference deeplabv2.py:343-349)
        x = block(
            self.planes,
            stride=self.stride,
            dilation=self.dilation,
            has_downsample=True,
            norm=self.norm,
            dtype=self.dtype,
            name="0",
        )(x, train, update_stats)
        for i in range(1, self.blocks):
            x = block(
                self.planes, dilation=self.dilation, norm=self.norm, dtype=self.dtype,
                name=str(i)
            )(x, train, update_stats)
        return x


class ASPPClassifier(nn.Module):
    """Classic ASPP head: sum of 4 dilated 3×3 convs (reference deeplabv2.py:71-95)."""

    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rng=None):
        out = None
        for i, d in enumerate(self.dilations):
            branch = conv(
                self.num_classes, 3, padding=d, dilation=d, use_bias=True, name=f"conv_{i}",
                dtype=self.dtype,
            )(x)
            out = branch if out is None else out + branch
        return out


class ProDAClassifier(nn.Module):
    """ProDA `Classifier_Module2` (reference deeplabv2.py:117-257).

    Five ASPP branches (1×1 + four dilated 3×3, each Conv→GroupNorm→ReLU) → concat
    → SE block → 3×3 bottleneck conv → GroupNorm → Dropout2d(0.1) → 1×1 classifier.
    Returns {"feat": post-dropout 256-d features, "out": logits} — feat is the
    prototype feature space (F=256), reference deeplabv2.py:248-257.
    """

    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    droprate: float = 0.1
    use_se: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rng=None):
        branches = [
            nn.relu(
                TorchGroupNorm(dtype=self.dtype, name="branch0_gn")(
                    conv(256, 1, use_bias=True, name="branch0_conv", dtype=self.dtype)(x)
                )
            )
        ]
        for i, d in enumerate(self.dilations, start=1):
            branches.append(
                nn.relu(
                    TorchGroupNorm(dtype=self.dtype, name=f"branch{i}_gn")(
                        conv(256, 3, padding=d, dilation=d, use_bias=True,
                             name=f"branch{i}_conv", dtype=self.dtype)(x)
                    )
                )
            )
        out = jnp.concatenate(branches, axis=-1)  # (N, H, W, 1280)
        if self.use_se:
            # f32 mode pins full precision (default rounds to bf16, see layers.conv)
            prec = None if self.dtype is not None else jax.lax.Precision.HIGHEST
            pooled = out.mean(axis=(1, 2))  # (N, 1280)
            se = nn.Dense(out.shape[-1] // 16, name="se_fc1", dtype=self.dtype,
                          precision=prec)(pooled)
            se = nn.relu(se)
            se = nn.Dense(out.shape[-1], name="se_fc2", dtype=self.dtype,
                          precision=prec)(se)
            se = nn.sigmoid(se)
            out = out * se[:, None, None, :]
        out = conv(256, 3, padding=1, use_bias=True, name="bottleneck_conv", dtype=self.dtype)(out)
        out = TorchGroupNorm(dtype=self.dtype, name="bottleneck_gn")(out)
        feat = dropout2d(out, self.droprate, deterministic=not train, rng_key=dropout_rng)
        logits = conv(self.num_classes, 1, use_bias=False, name="head_conv", dtype=self.dtype)(feat)
        return {"feat": feat, "out": logits}


class DeepLabV2(nn.Module):
    """The full model (reference ResNetMulti, deeplabv2.py:260-395).

    __call__(x, train, update_stats, dropout_rng) → (aux_or_None, main) where main
    is {"feat","out"} for the ProDA classifier or raw logits for the classic one —
    matching the reference's forward contract (deeplabv2.py:375-395).
    """

    num_classes: int = 19
    layers: Sequence[int] = (3, 4, 23, 3)  # R101 default, R50 = (3, 4, 6, 3)
    classifier: str = "ProDA"  # "ProDA" | "normal"
    multi_level: bool = False
    norm: Any = TorchBatchNorm
    bn_momentum: float = 0.1
    droprate: float = 0.1  # ProDA head Dropout2d rate (reference deeplabv2.py:203)
    # Microsoft ProDA checkpoint layout (reference deeplabv2_proda.py:310-419):
    # the sole classifier lives at `layer5` (no aux head possible) and bn_clr
    # optionally inserts a BatchNorm(2048) `bn_pretrain` between layer4 and it.
    proda_layout: bool = False
    bn_clr: bool = False
    dtype: Any = None  # compute dtype (jnp.bfloat16 on TPU); params stay f32
    remat: bool = False  # per-bottleneck activation rematerialization

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = True, dropout_rng=None):
        norm = (
            partial(TorchBatchNorm, momentum=self.bn_momentum)
            if self.norm is TorchBatchNorm
            else self.norm
        )
        if self.classifier == "ProDA":
            clf = partial(ProDAClassifier, droprate=self.droprate)
        else:
            clf = ASPPClassifier

        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        x = conv(64, 7, stride=2, padding=3, name="conv1", dtype=dt)(x)
        x = norm(name="bn1")(x, train, update_stats)
        x = nn.relu(x)
        x = max_pool_ceil(x, window=3, stride=2, padding=1)
        x = ResLayer(64, self.layers[0], norm=norm, dtype=dt, remat=self.remat,
                     name="layer1")(x, train, update_stats)
        x = ResLayer(128, self.layers[1], stride=2, norm=norm, dtype=dt,
                     remat=self.remat, name="layer2")(x, train, update_stats)
        x = ResLayer(256, self.layers[2], dilation=2, norm=norm, dtype=dt,
                     remat=self.remat, name="layer3")(x, train, update_stats)
        aux = None
        if not self.proda_layout:
            # the aux head is STRUCTURAL, like the reference's: model_handler
            # always builds get_deeplab_v2(multi_level=True) and only flips the
            # runtime flag afterwards (reference model_handler.py:18-26, :58),
            # so every reference checkpoint carries layer5.* keys and its
            # strict load_state_dict demands them back. Params are created at
            # init; with the runtime flag off the head is never traced in
            # apply (zero compute) and its params are FROZEN by the optimizer
            # labels — matching torch, where grad stays None and SGD skips it.
            if self.multi_level or self.is_initializing():
                aux_out = clf(self.num_classes, dtype=dt, name="layer5")(x, train, dropout_rng)
                if self.multi_level:
                    aux = aux_out
        else:
            assert not self.multi_level, "ProDA layout has no aux head (deeplabv2_proda.py:397-419)"
        x = ResLayer(512, self.layers[3], dilation=4, norm=norm, dtype=dt,
                     remat=self.remat, name="layer4")(x, train, update_stats)
        if self.proda_layout and self.bn_clr:
            x = norm(name="bn_pretrain")(x, train, update_stats)
        head_name = "layer5" if self.proda_layout else "layer6"
        main = clf(self.num_classes, dtype=dt, name=head_name)(x, train, dropout_rng)
        return aux, main


def build_deeplab_v2(
    num_classes: int = 19,
    layers: Sequence[int] = (3, 4, 23, 3),
    classifier: str = "ProDA",
    multi_level: bool = False,
    group_norm_backbone: bool = False,
    bn_momentum: float = 0.1,
    droprate: float = 0.1,
    proda_layout: bool = False,
    bn_clr: bool = False,
    dtype=None,
    remat: bool = False,
) -> DeepLabV2:
    norm = TorchGroupNorm if group_norm_backbone else TorchBatchNorm
    return DeepLabV2(
        num_classes=num_classes,
        layers=tuple(layers),
        classifier=classifier,
        multi_level=multi_level,
        norm=norm,
        bn_momentum=bn_momentum,
        droprate=droprate,
        proda_layout=proda_layout,
        bn_clr=bn_clr,
        dtype=dtype,
        remat=remat,
    )
