"""Native C++ data-prep runtime vs the PIL/numpy reference path (byte-exact)."""

import numpy as np
import pytest
from PIL import Image

from onda_tpu import native
from onda_tpu.data.segmentation import load_image, normalize_image

MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)


@pytest.fixture(scope="module")
def pngs(tmp_path_factory, ):
    rng = np.random.default_rng(3)
    root = tmp_path_factory.mktemp("native")
    img = rng.integers(0, 255, size=(96, 160, 3), dtype=np.uint8)
    lbl = rng.integers(0, 34, size=(96, 160), dtype=np.uint8)
    ip, lp = str(root / "img.png"), str(root / "lbl.png")
    Image.fromarray(img).save(ip)
    Image.fromarray(lbl, "L").save(lp)
    return ip, lp


def test_available():
    assert native.available(), "native dataprep failed to build (g++/libpng)"


def test_image_prep_matches_pil(pngs):
    ip, _ = pngs
    got = native.prepare_image(ip, (32, 64), MEAN, STD)
    assert got is not None and got.shape == (32, 64, 3)
    pil = load_image(ip, (64, 32), Image.BICUBIC, rgb=True)  # (W, H) convention
    want = normalize_image(pil, MEAN, STD)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_label_prep_matches_pil(pngs):
    _, lp = pngs
    lut = np.zeros(256, np.int32)
    lut[:34] = np.arange(34)
    out = native.prepare_label(lp, (32, 64), (5, 9), lut)
    assert out is not None
    full, res = out
    want_full = lut[np.asarray(load_image(lp, (64, 32), Image.NEAREST, rgb=False), np.int32)]
    want_res = lut[np.asarray(load_image(lp, (9, 5), Image.NEAREST, rgb=False), np.int32)]
    np.testing.assert_array_equal(full, want_full)
    np.testing.assert_array_equal(res, want_res)


def test_dataset_native_vs_pil_identical(tmp_path):
    """SegmentationDataset output must not depend on the backend."""
    import os

    from onda_tpu.data.metadata import load_dataset_info, load_table
    from onda_tpu.data.segmentation import SegmentationDataset

    from .synthetic import make_synthetic_dataset

    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, intensities=(0,), per_domain=1, size_wh=(64, 32))
    info = load_dataset_info()
    table = load_table(f"{root}/metadata.json")
    ds = SegmentationDataset(
        root, table, dict(tuple(p) for p in info["label2train"]), (64, 32),
        mean=MEAN, std=STD,
    )
    os.environ["ONDA_NATIVE"] = "1"
    s_native = ds[0]
    os.environ["ONDA_NATIVE"] = "0"
    s_pil = ds[0]
    os.environ["ONDA_NATIVE"] = "1"
    np.testing.assert_allclose(s_native["image"], s_pil["image"], atol=1e-6)
    np.testing.assert_array_equal(s_native["label"], s_pil["label"])
    np.testing.assert_array_equal(s_native["label_res"], s_pil["label_res"])


def test_batch_executor_matches_per_sample(tmp_path):
    """The pipelined C++ batch executor must produce exactly the per-sample path."""
    from onda_tpu.data.loader import collate
    from onda_tpu.data.metadata import load_dataset_info, load_table
    from onda_tpu.data.segmentation import SegmentationDataset

    from .synthetic import make_synthetic_dataset

    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, intensities=(0,), per_domain=4, size_wh=(64, 32))
    info = load_dataset_info()
    table = load_table(f"{root}/metadata.json")
    ds = SegmentationDataset(
        root, table, dict(tuple(p) for p in info["label2train"]), (64, 32),
        mean=MEAN, std=STD,
    )
    idxs = list(range(min(4, len(ds))))
    batch = ds.prepare_batch(idxs)
    assert batch is not None, "executor path unavailable"
    want = collate([ds[i] for i in idxs])
    np.testing.assert_allclose(batch["image"], want["image"], atol=1e-6)
    np.testing.assert_array_equal(batch["label"], want["label"])
    np.testing.assert_array_equal(batch["label_res"], want["label_res"])
    assert batch["image_path"] == want["image_path"]
    # unlabeled rows (video stream): images only
    t2 = table.copy()
    t2["label_path"] = None
    ds2 = SegmentationDataset(
        root, t2, dict(tuple(p) for p in info["label2train"]), (64, 32),
        mean=MEAN, std=STD,
    )
    b2 = ds2.prepare_batch(idxs)
    assert b2 is not None and "label" not in b2
    np.testing.assert_allclose(b2["image"], want["image"], atol=1e-6)
    # error propagation: missing file → job reports failure → fallback (None)
    t3 = table.copy()
    t3.loc[0, "image_path"] = "does_not_exist.png"
    ds3 = SegmentationDataset(
        root, t3, dict(tuple(p) for p in info["label2train"]), (64, 32),
        mean=MEAN, std=STD,
    )
    assert ds3.prepare_batch(idxs) is None


def test_trns_png_decodes_without_overflow(tmp_path):
    """A palette PNG with a tRNS transparency chunk must decode safely: libpng's
    tRNS→alpha expansion adds a 4th channel the original color type does not
    advertise; stripping must account for it (a gate on the original color
    type alone overflows the caller's RGB-sized buffer) and the pixels must
    match PIL's convert('RGB')."""
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 8, size=(40, 56), dtype=np.uint8)
    img = Image.fromarray(idx, "P")
    img.putpalette(bytes(rng.integers(0, 255, size=768, dtype=np.uint8)))
    ip = str(tmp_path / "trns.png")
    img.save(ip, transparency=3)  # palette entry 3 transparent -> tRNS chunk
    got = native.prepare_image(ip, (20, 28), MEAN, STD)
    assert got is not None and got.shape == (20, 28, 3)
    pil = load_image(ip, (28, 20), Image.BICUBIC, rgb=True)
    want = normalize_image(pil, MEAN, STD)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_label_out_of_range_fails_loudly(tmp_path):
    """A label id outside the remap table must fail the native fast path (the
    PIL path raises IndexError on the same input) instead of silently training
    the pixel as class 0."""
    lbl = np.full((16, 24), 200, np.uint8)  # id 200 >> 35-entry LUT
    lp = str(tmp_path / "oob.png")
    Image.fromarray(lbl, "L").save(lp)
    lut = np.zeros(35, np.int32)
    assert native.prepare_label(lp, (8, 12), (2, 3), lut) is None
