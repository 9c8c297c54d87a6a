"""Segmentation mask visualization (reference framework/utils/viz_segmask.py,
utils/logging.py:5-17): colorize a 19-class index mask with the Cityscapes palette
and compose sample images for logging."""

from __future__ import annotations

import os

import numpy as np


def colorize_mask(mask: np.ndarray, palette: list) -> np.ndarray:
    """(H, W) int mask → (H, W, 3) uint8 RGB; 255-ignore maps to the last entry."""
    pal = np.asarray(palette, np.uint8)
    idx = np.where((mask >= 0) & (mask < len(pal) - 1), mask, len(pal) - 1)
    return pal[idx]


def save_sample(image_norm: np.ndarray, pred: np.ndarray, label: np.ndarray | None,
                palette: list, mean, std, out_path: str) -> str:
    """Side-by-side (input | prediction | label) PNG; input is denormalized BGR→RGB."""
    from PIL import Image

    mean = np.asarray(mean, np.float32) / 255.0
    std = np.asarray(std, np.float32) / 255.0
    rgb = ((image_norm * std + mean)[:, :, ::-1] * 255.0).clip(0, 255).astype(np.uint8)
    panels = [rgb, colorize_mask(pred, palette)]
    if label is not None:
        panels.append(colorize_mask(label, palette))
    h = min(p.shape[0] for p in panels)
    canvas = np.concatenate([p[:h] for p in panels], axis=1)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    Image.fromarray(canvas).save(out_path)
    return out_path
