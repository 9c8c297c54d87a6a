"""Building-block layers with torch-parity semantics, NHWC layout.

The reference models are plain torchvision-style modules (reference
framework/model/deeplabv2.py); to import their checkpoints bit-exactly we need a
BatchNorm with torch's exact train/eval/update semantics and a ceil-mode max pool.
Everything is NHWC — the TPU-native layout (convs map onto the MXU without
transposes).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train(x, scale, bias, eps):
    """Train-mode batch norm with a closed-form backward.

    Returns (y, mean, biased_var); mean/var feed only the (non-differentiated)
    running-stat update — their cotangents are ignored in the VJP, so do NOT
    differentiate a loss through the returned statistics.

    The hand-written backward is the standard fused BN gradient
        dx = γ·inv · (dy − mean(dy) − x̂·mean(dy·x̂)).
    NOT used by default: on the flagship fused step it measured ~24 ms/step
    SLOWER than XLA's autodiff of `_bn_train_math` (457 vs 433 ms) — saving the
    raw activation as a residual defeats XLA's own rematerialization choices.
    Kept (with a gradient-parity test) as infrastructure for future tuning.
    """
    y, mean, var, _ = _bn_train_math(x, scale, bias, eps)
    return y, mean, var


def _bn_train_math(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(0, 1, 2))
    mean_sq = (x32 * x32).mean(axis=(0, 1, 2))
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    inv0 = lax.rsqrt(var + eps)
    y = ((x32 - mean) * (inv0 * scale) + bias).astype(x.dtype)
    return y, mean, var, inv0


def _bn_train_fwd(x, scale, bias, eps):
    y, mean, var, inv0 = _bn_train_math(x, scale, bias, eps)
    return (y, mean, var), (x, mean, inv0, scale)


def _bn_train_bwd(eps, res, cts):
    dy = cts[0].astype(jnp.float32)  # cotangents for mean/var are aux-only: ignored
    x, mean, inv0, scale = res
    n = float(np.prod([x.shape[0], x.shape[1], x.shape[2]]))
    x_hat = (x.astype(jnp.float32) - mean) * inv0
    dbeta = dy.sum(axis=(0, 1, 2))
    dgamma = (dy * x_hat).sum(axis=(0, 1, 2))
    dx = (scale * inv0) * (dy - dbeta / n - x_hat * (dgamma / n))
    return dx.astype(x.dtype), dgamma, dbeta


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)

import numpy as np  # noqa: E402  (used by the BN backward)


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with torch semantics and an explicit stats-update switch.

    The reference drives three BN behaviors (SURVEY.md §7.3 item 1):
      * normalize by **batch** stats whenever the module is in train mode,
        regardless of whether running stats update (torch `track_running_stats`
        only gates the update, reference methods/adaptation_model.py:29-36);
      * normalize by **running** stats in eval mode;
      * running update uses the *unbiased* batch variance, normalization the
        biased one (torch parity).

    `update_stats=False` implements the reference's `switch_batch_statistics(model,
    False)` freeze used around source-replay passes (reference
    methods/prototypes.py:427-440). Momentum is a module attribute so the static
    teacher can carry BN_MOMENTUM=0.01 (reference methods/prototypes.py:55-57)
    while sharing the same parameter structure.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = True):
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "running_var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        if train:
            # One-pass batch statistics; XLA autodiff of this form measured FASTER
            # than the closed-form custom VJP (_bn_train, kept for reference):
            # 433 vs 457 ms/step on the flagship fused step.
            y, mean, var, _ = _bn_train_math(x, scale, bias, self.eps)
            if update_stats and not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
            return y

        mean, var = ra_mean.value, ra_var.value
        inv = lax.rsqrt(var + self.eps) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(x.dtype)


class TorchGroupNorm(nn.Module):
    """GroupNorm(32) as used by the ProDA classifier head (reference deeplabv2.py:141).

    `dtype` keeps the output in the compute dtype (bf16) instead of widening the
    whole activation to f32 (the reductions still run in f32 internally)."""

    num_groups: int = 32
    eps: float = 1e-5
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = True):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.eps, dtype=self.dtype, name="gn"
        )(x)


def conv(features, kernel, stride=1, dilation=1, padding=0, use_bias=False, name=None,
         dtype=None):
    """torch-style Conv2d: explicit symmetric padding, NHWC/HWIO.

    `dtype` is the compute dtype (bfloat16 on TPU for speed); params stay f32.
    In f32 mode (dtype None) the conv precision is pinned to HIGHEST: the
    default precision rounds f32 conv inputs to bf16 on both TPU and this
    XLA:CPU build (~5e-2 abs error per layer — measured), which would break
    checkpoint-parity with the torch reference."""
    pad = ((padding, padding), (padding, padding)) if isinstance(padding, int) else padding
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=pad,
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        precision=None if dtype is not None else jax.lax.Precision.HIGHEST,
        name=name,
    )


def max_pool_ceil(x, window: int, stride: int, padding: int):
    """MaxPool2d with ceil_mode=True (reference deeplabv2.py:289-291).

    torch's ceil mode lets the last window start inside the (left-padded) input,
    which changes the output length: e.g. 256 → 129 for k=3,s=2,p=1. We reproduce it
    with explicit asymmetric -inf padding.
    """

    def out_size(size):
        return -(-(size + 2 * padding - window) // stride) + 1  # ceil division

    pads = []
    for size in x.shape[1:3]:
        o = out_size(size)
        hi = (o - 1) * stride + window - size - padding
        pads.append((padding, max(hi, padding)))
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), *pads, (0, 0)),
    )


def dropout2d(x, rate: float, deterministic: bool, rng_key=None):
    """Channel-wise dropout (torch nn.Dropout2d): drops whole (N, C) feature maps.

    A None rng in train mode disables dropout (used by parity tests, where torch
    dropout randomness can't be matched anyway)."""
    if deterministic or rate == 0.0 or rng_key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng_key, p=keep, shape=(x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(mask, x / keep, 0.0)


NormFactory = Callable[..., nn.Module]
