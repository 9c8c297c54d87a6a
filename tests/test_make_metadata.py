"""`tools/make_metadata.py` oracle test (round-2 verdict weak #1 / next-round #5).

The tool is the designated recovery for the reference's missing rain/fog
metadata tables (SURVEY.md §2.12, §7.3 item 7). This builds a synthetic
on-disk weather-Cityscapes tree — rain and fog layouts, the fog one produced
by the reference's own /clear/ → /fog/<int>/ path rewrite convention
(reference temp_fog_filename_creation.py:13-24) — runs the REAL CLI tool on
it, and asserts the reference's own `get_split`
(reference weather_cityscapes_sets.py:11-35, which loads the table from a
CWD-relative path at import) and our `data/splits.get_split` produce identical
train/val frames from its output.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from onda_tpu.data.metadata import load_table
from onda_tpu.data.splits import get_split as our_get_split

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CITIES = ("aachen", "bochum")
N_TRAIN, N_VAL = 3, 2


def _png(path, shape=(4, 6), mode="RGB", seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    if mode == "RGB":
        arr = rng.integers(0, 255, size=(*shape, 3), dtype=np.uint8)
    else:
        arr = rng.integers(0, 34, size=shape, dtype=np.uint8)
    Image.fromarray(arr, mode).save(path)


def build_tree(root, kind):
    """Clear + two weather intensities; labels shared across domains by frame
    name (the rewrite convention keeps gtFine paths identical)."""
    weather_dirs = ["rain/25mm", "rain/100mm"] if kind == "rain" else ["fog/150m", "fog/750m"]
    clear_imgs = {}
    for set_, n in (("train", N_TRAIN), ("val", N_VAL)):
        for city in CITIES:
            for i in range(n):
                frame = f"{city}_{i:06d}_000019"
                rel = f"leftImg8bit/{set_}/clear/{city}/{frame}_leftImg8bit.png"
                _png(os.path.join(root, rel), seed=hash((set_, city, i)) % 2**32)
                _png(
                    os.path.join(root, f"gtFine/{set_}/{city}/{frame}_gtFine_labelIds.png"),
                    mode="L",
                )
                clear_imgs.setdefault(set_, []).append(rel)
    # the reference generated weather rows by rewriting /clear/ → /<weather>/<int>/
    # in the image path (labels untouched); the on-disk tree mirrors that
    for wdir in weather_dirs:
        for set_, rels in clear_imgs.items():
            for rel in rels:
                dst = rel.replace("/clear/", f"/{wdir.split('/')[0]}/{wdir.split('/')[1]}/")
                shutil.copy(os.path.join(root, rel), _mk(os.path.join(root, dst)))
    # distractors the scanner must skip: an unlabeled frame and an unknown domain
    _png(os.path.join(root, "leftImg8bit/train/clear/aachen/orphan_999_leftImg8bit.png"))
    _png(os.path.join(root, "leftImg8bit/train/snow/5cm/aachen/x_000000_leftImg8bit.png"))
    return root


def _mk(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def run_tool(root, kind):
    out = os.path.join(root, "metadata.json" if kind == "rain" else "metadata_fog.json")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_metadata.py"),
         "--root", root, "--kind", kind, "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert res.returncode == 0, res.stderr
    return out


def ref_get_split(metadata_json, scratch_cwd):
    """Import the reference's split module bound to the generated table: it
    reads 'framework/dataset/weather_cityscapes_list/metadata.json' relative
    to the CWD at IMPORT time (reference weather_cityscapes_sets.py:6-8)."""
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout not available")
    pytest.importorskip("sklearn")  # the reference module imports it
    rel_dir = os.path.join(scratch_cwd, "framework/dataset/weather_cityscapes_list")
    os.makedirs(rel_dir, exist_ok=True)
    shutil.copy(metadata_json, os.path.join(rel_dir, "metadata.json"))
    mod_name = "framework.dataset.weather_cityscapes_list.weather_cityscapes_sets"
    old_cwd = os.getcwd()
    sys.modules.pop(mod_name, None)  # force a re-import bound to the new table
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    os.chdir(scratch_cwd)
    try:
        mod = __import__(mod_name, fromlist=["_"])
        return mod.get_split
    finally:
        os.chdir(old_cwd)
        sys.modules.pop(mod_name, None)  # don't leak the scratch binding


def paths(df):
    return sorted(df["image_path"].tolist())


@pytest.mark.parametrize("kind,intensities", [("rain", (25, 100)), ("fog", (150, 750))])
def test_scan_layout_and_counts(tmp_path, kind, intensities):
    root = build_tree(str(tmp_path / kind), kind)
    table = load_table(run_tool(root, kind))
    assert sorted(table.columns) == ["image_path", "intensity", "label_path", "set"]
    per_domain_train = N_TRAIN * len(CITIES)
    per_domain_val = N_VAL * len(CITIES)
    counts = table.groupby(["set", "intensity"]).size()
    for inten in (0, *intensities):
        assert counts[("train", inten)] == per_domain_train, counts
        assert counts[("val", inten)] == per_domain_val, counts
    # distractors skipped: the unlabeled orphan and the unknown snow domain
    assert not table["image_path"].str.contains("orphan|snow").any()
    # every row's label exists on disk and follows the shared-gtFine convention
    for _, row in table.iterrows():
        assert os.path.exists(os.path.join(root, row["label_path"])), row["label_path"]
        assert "/clear/" not in row["label_path"]


def test_reference_get_split_consumes_tool_output(tmp_path):
    """The reference's own split builder run on the tool's table must bucket
    identically to ours — domain by domain, frame for frame."""
    root = build_tree(str(tmp_path / "ds"), "rain")
    meta = run_tool(root, "rain")
    table = load_table(meta)
    ref_split = ref_get_split(meta, str(tmp_path / "cwd"))

    domains = [(0,), (25,), (100,), (25, 100)]  # incl. a merged multi-intensity set
    for domain in domains:
        ref_out = ref_split("intensity", [domain], [domain])
        our_out = our_get_split(table, "intensity", [domain], [domain])
        for part in ("train", "val"):
            rdf, odf = ref_out[part][domain], our_out[part][domain]
            assert paths(rdf) == paths(odf), (domain, part)
            assert len(rdf), (domain, part)  # non-vacuous
            pd.testing.assert_frame_equal(
                rdf.reset_index(drop=True), odf.reset_index(drop=True)
            )
    # restrictions filter parity (reference get_split's `restrictions` arg)
    ref_r = ref_split("intensity", [(0,)], [(0,)], {"set": "train"})
    our_r = our_get_split(table, "intensity", [(0,)], [(0,)], {"set": "train"})
    assert paths(ref_r["train"][(0,)]) == paths(our_r["train"][(0,)])
    assert len(ref_r["val"][(0,)]) == len(our_r["val"][(0,)]) == 0
