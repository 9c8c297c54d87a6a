"""Evaluation metrics: confusion histogram / IoU / streaming ECE — on-device.

The reference computes these on host numpy per image (fast_hist via np.bincount,
reference framework/utils/func.py:77-85; streaming ECE via a sparse one-hot matmul,
reference framework/utils/monitoring.py:99-136). Here both are jittable scatter-adds
so evaluation never leaves the device until the final per-class reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fast_hist(label: jnp.ndarray, pred: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Confusion-matrix accumulation (reference func.py:77-79).

    label/pred: int arrays of any (equal) shape. Pixels with label outside
    [0, num_classes) are dropped. Returns (num_classes, num_classes) int32 where
    hist[l, p] counts pixels with ground truth l predicted p.
    """
    label = label.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    valid = (label >= 0) & (label < num_classes)
    idx = jnp.where(valid, num_classes * label + pred, num_classes * num_classes)
    flat = jnp.zeros((num_classes * num_classes + 1,), jnp.int32).at[idx].add(1)
    return flat[:-1].reshape(num_classes, num_classes)


def per_class_iu(hist) -> np.ndarray:
    """Per-class IoU from a confusion matrix (reference func.py:82-85)."""
    hist = np.asarray(hist, dtype=np.float64)
    diag = np.diag(hist)
    return diag / (hist.sum(1) + hist.sum(0) - diag + np.finfo(float).eps)


def mean_entropy(probs: jnp.ndarray) -> jnp.ndarray:
    """Mean of the reference's weighted self-information map.

    `prob_2_entropy` (reference utils/func.py:71-74) normalizes by log2(C), and
    its eval consumer means over ALL axes INCLUDING channels (reference
    eval_UDA.py:48-51) — so the logged "val entropy" is the per-pixel
    normalized entropy divided by C (uniform predictions log 1/C, not 1).
    Upstream quirk reproduced for logged-value parity; caught by the SEGMENT
    run-level oracle (tests/test_segment_parity.py), where our sum-over-
    channels version read exactly 19x the reference's."""
    c = probs.shape[-1]
    ent = -(probs * jnp.log2(probs + 1e-30)) / jnp.log2(float(c))
    return ent.mean()


# ---------------------------------------------------------------------------
# Streaming expected calibration error
# ---------------------------------------------------------------------------


def ece_init(bins: int) -> jnp.ndarray:
    """(bins, 3) accumulator: [summed confidence, #correct, #samples] per bin
    (reference monitoring.py:99-104)."""
    return jnp.zeros((bins, 3), jnp.float32)


def ece_record(acc: jnp.ndarray, probs: jnp.ndarray, label: jnp.ndarray,
               weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """Accumulate a batch (reference monitoring.py:106-127).

    probs: (..., C) probabilities; label: (...) int ground truth. Bin index is
    floor(conf / gap) clipped into range (the reference's sparse scatter relies on
    confidences < 1; we clip to be safe). Like the reference, 255-ignore pixels
    DO count (as incorrect); `weight` (broadcastable to label's shape, 0/1)
    excludes pixels the reference never sees — the repeated rows a padded final
    evaluation batch adds (the reference loader never pads).
    """
    bins = acc.shape[0]
    conf = probs.max(axis=-1).reshape(-1)
    pred = probs.argmax(axis=-1).reshape(-1)
    lbl = label.reshape(-1)
    bin_idx = jnp.clip((conf * bins).astype(jnp.int32), 0, bins - 1)
    correct = (pred == lbl).astype(jnp.float32)
    ones = jnp.ones_like(conf)
    stacked = jnp.stack([conf, correct, ones], axis=-1)  # (P, 3)
    if weight is not None:
        w = jnp.broadcast_to(weight, label.shape).reshape(-1).astype(jnp.float32)
        stacked = stacked * w[:, None]
    return acc.at[bin_idx].add(stacked)


def ece_value(acc: jnp.ndarray) -> jnp.ndarray:
    """|sum_conf - n_correct| summed over bins / total samples (reference monitoring.py:132-136)."""
    return jnp.abs(acc[:, 0] - acc[:, 1]).sum() / acc[:, 2].sum()


def hist_update_from_logits(
    hist: jnp.ndarray, upsampled_pred_labels: jnp.ndarray, label: jnp.ndarray
) -> jnp.ndarray:
    """Evaluation inner loop: accumulate argmax predictions vs labels."""
    return hist + fast_hist(label, upsampled_pred_labels, hist.shape[0])


def miou(hist) -> float:
    return float(np.nanmean(per_class_iu(hist)))


jit_fast_hist = jax.jit(fast_hist, static_argnums=2)
