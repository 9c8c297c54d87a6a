"""Resize ops matching the reference's torch semantics, as dense matmuls.

The reference upsamples logits with ``nn.Upsample(mode="bilinear",
align_corners=True)`` (reference methods/adaptation_model.py:94-98) and downsamples
labels with ``F.interpolate`` (default nearest, reference methods/prototypes.py:144).
``jax.image.resize`` has neither exact semantic, so we build explicit interpolation
matrices and apply them as two matmuls (separable): ``out = A_h @ x @ A_wᵀ``. The
matrices are tiny (H_out × H_in) and the matmuls map straight onto the MXU — on TPU
this is faster than gather-based resize for the eval path's 65×129 → 512×1024 blowup.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _bilinear_matrix_ac(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) bilinear weights with align_corners=True (torch Upsample)."""
    a = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        a[0, 0] = 1.0
        return a
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size) * scale
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    a[np.arange(out_size), lo] += 1.0 - frac
    a[np.arange(out_size), hi] += frac
    return a


@lru_cache(maxsize=64)
def _nearest_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) one-hot rows with torch F.interpolate 'nearest' index mapping."""
    a = np.zeros((out_size, in_size), np.float32)
    src = np.minimum((np.arange(out_size) * (in_size / out_size)).astype(np.int64), in_size - 1)
    a[np.arange(out_size), src] = 1.0
    return a


def _apply_separable(x: jnp.ndarray, a_h: np.ndarray, a_w: np.ndarray) -> jnp.ndarray:
    """x: (N, H, W, C) → (N, H', W', C) via per-axis matmuls."""
    ah = jnp.asarray(a_h)
    aw = jnp.asarray(a_w)
    x = jnp.einsum("oh,nhwc->nowc", ah, x, precision="highest",
                   preferred_element_type=jnp.float32)
    return jnp.einsum("pw,nhwc->nhpc", aw, x, precision="highest",
                      preferred_element_type=jnp.float32)


def upsample_bilinear_ac(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear align_corners=True resize of NHWC tensors (torch nn.Upsample parity)."""
    h_out, w_out = out_hw
    n, h, w, c = x.shape
    if (h, w) == (h_out, w_out):
        return x
    return _apply_separable(
        x, _bilinear_matrix_ac(h_out, h), _bilinear_matrix_ac(w_out, w)
    )


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize of NHW (labels) or NHWC tensors (torch F.interpolate parity)."""
    h_out, w_out = out_hw
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    n, h, w, c = x.shape
    if (h, w) != (h_out, w_out):
        x = _apply_separable(
            x.astype(jnp.float32), _nearest_matrix(h_out, h), _nearest_matrix(w_out, w)
        )
    return x[..., 0] if squeeze else x
