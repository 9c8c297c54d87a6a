"""Logger sink behavior: JSONL always, wandb mask overlays when enabled.

The reference's sample images are `wandb.Image`s with interactive
predictions/ground-truth mask overlays and per-class labels (reference
utils/logging.py:5-17, adaptation_model.py:181-200). These tests pin that the
rebuild's `MaskSample` payload reaches wandb in exactly that shape, while the
JSONL sink records the saved PNG path.
"""

import json
import sys
import types

import numpy as np

from onda_tpu.utils.logging_ import Logger
from onda_tpu.utils.viz import MaskSample, colorize_mask, denormalize_rgb


class _FakeImage:
    def __init__(self, data, masks=None, caption=None):
        self.data = data
        self.masks = masks
        self.caption = caption


def _fake_wandb(records):
    mod = types.ModuleType("wandb")
    mod.Image = _FakeImage
    mod.run = types.SimpleNamespace(name=None)
    mod.init = lambda **kw: records.setdefault("init", kw)
    mod.log = lambda payload, step=None: records.setdefault("logs", []).append(
        (payload, step))
    return mod


def test_logger_wandb_mask_sample(tmp_path, monkeypatch):
    records = {"logs": []}
    monkeypatch.setitem(sys.modules, "wandb", _fake_wandb(records))

    png = tmp_path / "sample.png"
    png.write_bytes(b"not-a-real-png")
    sample = MaskSample(
        image_rgb=np.zeros((4, 6, 3), np.uint8),
        pred=np.ones((4, 6), np.int32),
        label=np.full((4, 6), 255, np.int32),
        class_labels={0: "road", 1: "sidewalk"},
        caption="Sample from clear",
        path=str(png),
    )
    logger = Logger(log_dir=str(tmp_path), use_wandb=True)
    logger.log({"Total target loss": 1.5,
                "Condition clear sample 0": sample})
    logger.close()

    # wandb payload: reference key name carries an Image with both overlays
    payload, step = records["logs"][0]
    img = payload["Condition clear sample 0"]
    assert isinstance(img, _FakeImage)
    assert img.caption == "Sample from clear"
    assert set(img.masks) == {"predictions", "ground_truth"}
    np.testing.assert_array_equal(img.masks["predictions"]["mask_data"], sample.pred)
    assert img.masks["predictions"]["class_labels"] == {0: "road", 1: "sidewalk"}
    assert payload["Total target loss"] == 1.5

    # JSONL records the path string for the same key
    rec = json.loads((tmp_path / "metrics.jsonl").read_text().splitlines()[0])
    assert rec["Condition clear sample 0"] == str(png)
    assert rec["Total target loss"] == 1.5


def test_logger_jsonl_only_without_wandb(tmp_path):
    sample = MaskSample(np.zeros((2, 2, 3), np.uint8), np.zeros((2, 2), np.int32),
                        None, {0: "road"}, "cap", str(tmp_path / "x.png"))
    logger = Logger(log_dir=str(tmp_path), use_wandb=False)
    logger.log({"loss": 2.0, "Condition clear sample 0": sample})
    logger.close()
    rec = json.loads((tmp_path / "metrics.jsonl").read_text().splitlines()[0])
    assert rec["loss"] == 2.0
    assert rec["Condition clear sample 0"].endswith("x.png")
    # label=None → only the predictions overlay
    fake = types.ModuleType("wandb")
    fake.Image = _FakeImage
    img = sample.to_wandb(fake)
    assert set(img.masks) == {"predictions"}


def test_denormalize_roundtrip():
    """denormalize inverts the BGR-flip + Normalize(mean/255, std/255) transform
    (reference segmentation_db.py:97-99)."""
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(5, 7, 3)).astype(np.uint8)
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    bgr = rgb[:, :, ::-1].astype(np.float32) / 255.0
    norm = (bgr - mean / 255.0) / (std / 255.0)
    back = denormalize_rgb(norm, mean, std)
    np.testing.assert_array_equal(back, rgb)


def test_colorize_mask_ignore():
    pal = [[10, 0, 0], [0, 10, 0], [0, 0, 0]]  # last entry = ignore color
    mask = np.array([[0, 1], [255, 2]], np.int32)
    out = colorize_mask(mask, pal)
    np.testing.assert_array_equal(out[0, 0], [10, 0, 0])
    np.testing.assert_array_equal(out[1, 0], [0, 0, 0])  # 255 → ignore
    np.testing.assert_array_equal(out[1, 1], [0, 0, 0])  # out of range → ignore
