"""Metadata tables for the weather-Cityscapes datasets.

The reference drives all datasets from pandas DataFrames loaded from JSON metadata
files (reference framework/dataset/weather_cityscapes_list/*.py). Those JSONs are
missing from the public checkout (SURVEY.md §2.12); the schema is recoverable from
the surviving `bern_video/metadata_bern.json` and the fog-generation helper
(reference temp_fog_filename_creation.py:7-27):

    columns: image_path, label_path (nullable), set ∈ {train, val}, and a domain
    column — `intensity` (rain mm / fog visibility) or `scene`.

This module loads such tables and can REGENERATE them by scanning a
weather-Cityscapes directory layout:

    leftImg8bit/{train,val}/{clear|rain/<mm>mm|fog/<vis>m}/<city>/<frame>_leftImg8bit.png
    gtFine/{train,val}/<city>/<frame>_gtFine_labelIds.png
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

import pandas as pd


def load_table(path: str) -> pd.DataFrame:
    """Read a metadata JSON into a DataFrame (pandas read_json orientation)."""
    return pd.read_json(path)


def save_table(df: pd.DataFrame, path: str) -> None:
    df.to_json(path)


def _label_path_for(image_rel: str) -> str:
    """leftImg8bit/<set>/<domain...>/<city>/<frame>_leftImg8bit.png → gtFine labelIds."""
    parts = Path(image_rel).parts
    set_, city, fname = parts[1], parts[-2], parts[-1]
    stem = fname.replace("_leftImg8bit.png", "")
    return str(Path("gtFine") / set_ / city / f"{stem}_gtFine_labelIds.png")


def scan_weather_cityscapes(
    root: str, kind: str = "rain", require_labels: bool = True
) -> pd.DataFrame:
    """Build a rain/fog metadata table by scanning the dataset layout.

    kind="rain": domains are clear (intensity 0) + rain/<N>mm directories.
    kind="fog":  domains are clear (0) + fog/<N>m (visibility) directories —
    mirroring how the reference generated fog metadata by rewriting /clear/ paths
    (reference temp_fog_filename_creation.py:13-24).
    """
    root_p = Path(root)
    rows = []
    img_root = root_p / "leftImg8bit"
    pattern = re.compile(r"(\d+)(mm|m)$")
    for set_ in ("train", "val"):
        set_dir = img_root / set_
        if not set_dir.is_dir():
            continue
        for domain_dir in sorted(set_dir.iterdir()):
            if not domain_dir.is_dir():
                continue
            name = domain_dir.name
            if name == "clear":
                intensity = 0
            elif name in ("rain", "fog") and (
                (name == "rain") == (kind == "rain")
            ):
                for sub in sorted(domain_dir.iterdir()):
                    m = pattern.match(sub.name)
                    if not m:
                        continue
                    rows.extend(
                        _scan_domain(root_p, sub, set_, int(m.group(1)), require_labels)
                    )
                continue
            else:
                continue
            rows.extend(_scan_domain(root_p, domain_dir, set_, intensity, require_labels))
    return pd.DataFrame(rows, columns=["image_path", "label_path", "set", "intensity"])


def _scan_domain(root: Path, domain_dir: Path, set_: str, intensity: int, require_labels: bool):
    rows = []
    for png in sorted(domain_dir.rglob("*_leftImg8bit.png")):
        rel = png.relative_to(root)
        label_rel = _label_path_for(str(rel))
        has_label = (root / label_rel).exists()
        if require_labels and not has_label:
            continue
        rows.append(
            {
                "image_path": str(rel),
                "label_path": label_rel if has_label else None,
                "set": set_,
                "intensity": intensity,
            }
        )
    return rows


def load_dataset_info(path: str | None = None) -> dict:
    """The 19-class Cityscapes schema (label2train remap, names, palette, mean/std).

    Mirrors the reference's cityscapes info.json (reference
    framework/dataset/cityscapes_list/info.json:1-84) with `classnum_to_label`
    injected like the reference database handler does (database_handler.py:27-29).
    """
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "cityscapes_info.json")
    with open(path) as f:
        info = json.load(f)
    info["classnum_to_label"] = dict(enumerate(info["label"]))
    return info
