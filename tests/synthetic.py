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
