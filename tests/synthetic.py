"""Synthetic weather-Cityscapes fixture: tiny random PNGs + metadata table
(SURVEY.md §4 item 3) so every config runs end-to-end without the real dataset."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def make_synthetic_dataset(root, intensities=(0, 25), per_domain=4, size_wh=(64, 32), seed=0):
    """Create leftImg8bit/{train,val}/... + gtFine labelIds + metadata.json."""
    rng = np.random.default_rng(seed)
    rows = []
    w, h = size_wh
    for intensity in intensities:
        domain = "clear" if intensity == 0 else f"rain/{intensity}mm"
        for set_ in ("train", "val"):
            for i in range(per_domain):
                frame = f"city_{intensity}_{set_}_{i:03d}"
                img_rel = f"leftImg8bit/{set_}/{domain}/city/{frame}_leftImg8bit.png"
                lbl_rel = f"gtFine/{set_}/city/{frame}_gtFine_labelIds.png"
                img_path = os.path.join(root, img_rel)
                lbl_path = os.path.join(root, lbl_rel)
                os.makedirs(os.path.dirname(img_path), exist_ok=True)
                os.makedirs(os.path.dirname(lbl_path), exist_ok=True)
                if not os.path.exists(img_path):
                    Image.fromarray(
                        rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8), "RGB"
                    ).save(img_path)
                if not os.path.exists(lbl_path):
                    # raw Cityscapes labelIds in [0, 33]
                    Image.fromarray(
                        rng.integers(0, 34, size=(h, w), dtype=np.uint8), "L"
                    ).save(lbl_path)
                rows.append(
                    {"image_path": img_rel, "label_path": lbl_rel, "set": set_,
                     "intensity": intensity}
                )
    import pandas as pd

    table = pd.DataFrame(rows)
    table.to_json(os.path.join(root, "metadata.json"))
    return table


# labelIds whose label2train mapping is 0,1,2,3 (road, sidewalk, building, wall)
_CLASS_IDS = (7, 8, 11, 12)
_BASE_COLORS = np.array(
    [[200, 60, 60], [60, 200, 60], [60, 60, 200], [200, 200, 60]], np.float32
)


def make_shift_dataset(root, n_train=16, n_val=8, size_wh=(64, 32), shift=0.0, seed=0):
    """Structured learnable task: class = f(color); `shift` rotates the colors
    toward a target domain (the synthetic analog of rain intensity)."""
    rng = np.random.default_rng(seed)
    w, h = size_wh
    rows = []
    intensity = int(shift * 100)
    domain = "clear" if intensity == 0 else f"rain/{intensity}mm"
    for set_, count in (("train", n_train), ("val", n_val)):
        for i in range(count):
            # blocky label map over the 4 classes
            lbl_small = rng.integers(0, 4, size=(max(h // 16, 1), max(w // 16, 1)))
            lbl = np.kron(lbl_small, np.ones((16, 16), dtype=np.int64))[:h, :w]
            colors = _BASE_COLORS.copy()
            if shift:
                colors = colors[:, [1, 2, 0]] * shift + colors * (1 - shift)  # hue-ish mix
                colors = np.clip(colors + 40 * shift, 0, 255)
            img = colors[lbl] + rng.normal(0, 5, size=(h, w, 3))
            img = np.clip(img, 0, 255).astype(np.uint8)
            lbl_ids = np.asarray(_CLASS_IDS, np.uint8)[lbl]
            frame = f"shift_{intensity}_{set_}_{i:03d}"
            img_rel = f"leftImg8bit/{set_}/{domain}/city/{frame}_leftImg8bit.png"
            lbl_rel = f"gtFine/{set_}/city/{frame}_gtFine_labelIds.png"
            os.makedirs(os.path.dirname(os.path.join(root, img_rel)), exist_ok=True)
            os.makedirs(os.path.dirname(os.path.join(root, lbl_rel)), exist_ok=True)
            Image.fromarray(img, "RGB").save(os.path.join(root, img_rel))
            Image.fromarray(lbl_ids, "L").save(os.path.join(root, lbl_rel))
            rows.append({"image_path": img_rel, "label_path": lbl_rel, "set": set_,
                         "intensity": intensity})
    import pandas as pd

    return pd.DataFrame(rows)


def make_bern_dataset(root, n_clear=4, n_video=4, size_wh=(64, 32), seed=0):
    """external_video layout (reference bern_video/metadata_bern.json): labeled
    `clear` source rows + label-LESS `video` target rows, `scene` column."""
    rng = np.random.default_rng(seed)
    w, h = size_wh
    rows = []
    for scene, n, labeled in (("clear", n_clear, True), ("video", n_video, False)):
        for i in range(n):
            frame = f"{scene}_{i:03d}"
            img_rel = f"leftImg8bit/train/{scene}/bern/{frame}_leftImg8bit.png"
            img_path = os.path.join(root, img_rel)
            os.makedirs(os.path.dirname(img_path), exist_ok=True)
            Image.fromarray(
                rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8), "RGB"
            ).save(img_path)
            row = {"image_path": img_rel, "label_path": None, "set": "train",
                   "scene": scene}
            if labeled:
                lbl_rel = f"gtFine/train/bern/{frame}_gtFine_labelIds.png"
                lbl_path = os.path.join(root, lbl_rel)
                os.makedirs(os.path.dirname(lbl_path), exist_ok=True)
                Image.fromarray(
                    rng.integers(0, 34, size=(h, w), dtype=np.uint8), "L"
                ).save(lbl_path)
                row["label_path"] = lbl_rel
            rows.append(row)
    import pandas as pd

    table = pd.DataFrame(rows)
    table.to_json(os.path.join(root, "metadata_bern.json"))
    return table
