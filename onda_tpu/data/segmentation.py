"""Segmentation dataset: PNG decode → resize → remap → normalize, NHWC numpy.

Host-side pixel pipeline with exact parity to the reference's Segmentation_db
(reference framework/dataset/segmentation_db.py:16-99):

* image: PIL decode, **bicubic** resize to (W, H), RGB→BGR flip, then
  ToTensor+Normalize(mean/255, std/255) — note the reference normalizes the
  BGR-flipped image with RGB-ordered ImageNet stats; the pretrained checkpoints
  bake this in, so we replicate it bit-for-bit (SURVEY.md §7.4).
* label: nearest resize at full input resolution, LUT-remapped 34→19+255.
* label_res: nearest resize at the model's 1/8+1 output grid
  ([W//8+1, H//8+1], reference segmentation_db.py:89-94).

Output layout is NHWC float32 (TPU-native); the reference's CHW tensors exist only
on the torch side of the parity tests.
"""

from __future__ import annotations

from os import path

import numpy as np
from PIL import Image


class LabelMapper:
    """O(1) LUT class remap for index or RGB labels (reference func.py:88-115)."""

    def __init__(self, mapping: dict):
        first = next(iter(mapping.keys()))
        self.rgb = isinstance(first, (tuple, list))
        if self.rgb:
            self.lut = np.zeros(256 * 256 * 256, np.int32)
            for rgb, idx in mapping.items():
                self.lut[rgb[0] * 65536 + rgb[1] * 256 + rgb[2]] = idx
        else:
            # reference parity: a len(mapping)-entry table where negative keys
            # (the -1→255 ignore row) land at the END via numpy wraparound
            # (reference func.py:107-109). The reference indexes lut[source]
            # directly, so SPARSE positive keys crash it at construction; here
            # the table grows so a negative slot never collides with a
            # positive one (index size+k must exceed every positive key).
            keys = [int(k) for k in mapping.keys()]
            pos_max = max((k for k in keys if k >= 0), default=-1)
            neg_min = min((k for k in keys if k < 0), default=0)
            size = max(len(mapping), pos_max + 1 - neg_min)
            self.lut = np.zeros(size, np.int32)
            for src, dst in mapping.items():
                self.lut[int(src)] = dst

    def __call__(self, label: np.ndarray) -> np.ndarray:
        label = np.asarray(label, np.int32)
        if self.rgb:
            label = label @ np.array([65536, 256, 1], np.int32)
        return self.lut[label]


def load_image(file: str, size_wh, interpolation, rgb: bool) -> np.ndarray:
    """PIL load + resize (reference base_dataset.py:89-95). size_wh is (W, H) or None."""
    img = Image.open(file)
    if rgb:
        img = img.convert("RGB")
    if size_wh is not None:
        img = img.resize(tuple(size_wh), interpolation)
    return np.asarray(img, np.uint8)


def normalize_image(image_rgb_u8: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """RGB uint8 HWC → BGR float HWC, x/255 then (x-mean/255)/(std/255).

    Exactly the reference's preprocess + base_transform composition
    (reference segmentation_db.py:11-13,97-99).
    """
    bgr = image_rgb_u8[:, :, ::-1].astype(np.float32) / 255.0
    return (bgr - mean / 255.0) / (std / 255.0)


class SegmentationDataset:
    """Map-style dataset over a metadata DataFrame (reference Segmentation_db)."""

    def __init__(
        self,
        root: str,
        metadata,
        class_map: dict | LabelMapper,
        image_size_wh,
        mean,
        std,
        labels_size_wh=None,
        original_label: bool = False,
        predictions_dir: str | None = None,
    ):
        self.metadata = metadata.reset_index(drop=True)
        self.root = root
        self.image_size = list(image_size_wh)
        self.labels_size = list(labels_size_wh or image_size_wh)
        self.map = class_map if isinstance(class_map, LabelMapper) else LabelMapper(class_map)
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.original_label = original_label
        self.predictions_dir = predictions_dir

    def __len__(self):
        return len(self.metadata)

    @property
    def res_size(self):
        """The 1/8+1 output grid, (W, H) (reference segmentation_db.py:89-94)."""
        return [int(x / 8 + 1) for x in self.labels_size]

    def _native(self):
        """Native C++ prep path (onda_tpu/native): byte-exact with PIL, threaded,
        GIL-free. Disabled with ONDA_NATIVE=0 or for RGB-coded labels."""
        import os as _os

        if _os.environ.get("ONDA_NATIVE", "1") == "0" or self.map.rgb:
            return None
        from .. import native

        return native if native.available() else None

    def prepare_batch(self, indices) -> dict | None:
        """Whole-batch prep on the native pipelined executor (one job fans the
        per-image decode→resize→normalize/remap tasks across a persistent C++
        worker pool; see onda_tpu/native). Returns a collated batch dict, or
        None when the batch needs the per-sample fallback path (RGB-coded
        labels, raw-resolution labels, stored soft predictions, mixed
        labeled/unlabeled rows, or native unavailable)."""
        if self.original_label or self.predictions_dir or self.map.rgb:
            return None
        if self._native() is None:
            return None
        from .. import native

        ex = native.batch_executor()
        if ex is None:
            return None
        rows = [self.metadata.iloc[int(i)] for i in indices]
        image_paths = [path.join(self.root, r["image_path"]) for r in rows]
        label_rels = [r.get("label_path") if hasattr(r, "get") else r["label_path"] for r in rows]
        labeled = [isinstance(p, str) for p in label_rels]
        if any(labeled) and not all(labeled):
            return None
        img_job, images = ex.submit_images(
            image_paths, (self.image_size[1], self.image_size[0]), self.mean, self.std
        )
        batch = {"image_path": image_paths}
        lbl_job = None
        if all(labeled):
            label_paths = [path.join(self.root, p) for p in label_rels]
            lbl_job, full, res = ex.submit_labels(
                label_paths,
                (self.labels_size[1], self.labels_size[0]),
                (self.res_size[1], self.res_size[0]),
                self.map.lut,
            )
            batch["label_path"] = label_paths
        if ex.wait(img_job) != 0:
            if lbl_job is not None:
                ex.wait(lbl_job)
            return None
        batch["image"] = images
        if lbl_job is not None:
            if ex.wait(lbl_job) != 0:
                return None
            batch["label"] = full
            batch["label_res"] = res
        return batch

    def __getitem__(self, index: int) -> dict:
        row = self.metadata.iloc[int(index)]
        image_path = path.join(self.root, row["image_path"])
        native = self._native()
        image_arr = None
        if native is not None:
            image_arr = native.prepare_image(
                image_path, (self.image_size[1], self.image_size[0]), self.mean, self.std
            )
        if image_arr is None:
            image = load_image(image_path, self.image_size, Image.BICUBIC, rgb=True)
            image_arr = normalize_image(image, self.mean, self.std)
        sample = {"image": image_arr, "image_path": image_path}
        label_rel = row.get("label_path") if hasattr(row, "get") else row["label_path"]
        if label_rel is not None and isinstance(label_rel, str):
            label_path = path.join(self.root, label_rel)
            sample["label_path"] = label_path
            done = False
            if native is not None and not self.original_label:
                out = native.prepare_label(
                    label_path,
                    (self.labels_size[1], self.labels_size[0]),
                    (self.res_size[1], self.res_size[0]),
                    self.map.lut,
                )
                if out is not None:
                    full, res = out
                    sample["label"] = full.astype(np.uint8)
                    sample["label_res"] = res.astype(np.uint8)
                    done = True
            if not done:
                sample["label"] = self.map(
                    load_image(label_path, self.labels_size, Image.NEAREST, rgb=self.map.rgb)
                ).astype(np.uint8)
                sample["label_res"] = self.map(
                    load_image(label_path, self.res_size, Image.NEAREST, rgb=self.map.rgb)
                ).astype(np.uint8)
            if self.original_label:
                sample["label_raw"] = self.map(
                    load_image(label_path, None, Image.NEAREST, rgb=self.map.rgb)
                ).astype(np.uint8)
        if self.predictions_dir:
            soft_path = path.join(
                self.predictions_dir, row["image_path"].replace(".png", "_soft.npy")
            )
            sample["soft_path"] = soft_path
            if path.exists(soft_path):
                sample["soft_predictions"] = np.load(soft_path)
        return sample
