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


def denormalize_rgb(image_norm: np.ndarray, mean, std) -> np.ndarray:
    """Undo Normalize(mean/255, std/255) + the BGR flip → (H, W, 3) uint8 RGB."""
    mean = np.asarray(mean, np.float32) / 255.0
    std = np.asarray(std, np.float32) / 255.0
    rgb = (image_norm * std + mean)[:, :, ::-1] * 255.0
    return np.rint(rgb).clip(0, 255).astype(np.uint8)


def save_sample(image_rgb: np.ndarray, pred: np.ndarray, label: np.ndarray | None,
                palette: list, out_path: str) -> str:
    """Side-by-side (input | prediction | label) PNG from an already
    denormalized (H, W, 3) uint8 RGB input (see ``denormalize_rgb``)."""
    from PIL import Image

    rgb = image_rgb
    panels = [rgb, colorize_mask(pred, palette)]
    if label is not None:
        panels.append(colorize_mask(label, palette))
    h = min(p.shape[0] for p in panels)
    canvas = np.concatenate([p[:h] for p in panels], axis=1)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    Image.fromarray(canvas).save(out_path)
    return out_path


class MaskSample:
    """A sample image + segmentation masks for the experiment logger.

    Mirrors the reference's `wandb_image` payload (reference utils/logging.py:5-17,
    evaluate.py:112-120): the input image with interactive `predictions` /
    `ground_truth` mask overlays and per-class labels, under the key
    `Condition {set} sample {i}` (reference adaptation_model.py:181-200). A PNG
    rendering is always saved to `path` so air-gapped runs keep an artifact; the
    wandb sink turns this into `wandb.Image(..., masks=..., caption=...)`.
    (Deviation: the image is properly denormalized; the reference uploads the
    normalized tensor scaled by 255, which renders washed out.)
    """

    def __init__(self, image_rgb: np.ndarray, pred: np.ndarray,
                 label: np.ndarray | None, class_labels: dict, caption: str,
                 path: str):
        self.image_rgb = image_rgb
        self.pred = pred
        self.label = label
        self.class_labels = {int(k): str(v) for k, v in class_labels.items()}
        self.caption = caption
        self.path = path

    def to_wandb(self, wandb):
        masks = {"predictions": {"mask_data": np.asarray(self.pred),
                                 "class_labels": self.class_labels}}
        if self.label is not None:
            masks["ground_truth"] = {"mask_data": np.asarray(self.label),
                                     "class_labels": self.class_labels}
        return wandb.Image(self.image_rgb, masks=masks, caption=self.caption)
