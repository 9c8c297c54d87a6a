"""Data layer: synthetic dataset, preprocessing parity, splits, loader, buffer."""

import numpy as np
import pytest

from onda_tpu.data import LabelMapper, Loader, ReplayBuffer, SegmentationDataset
from onda_tpu.data.loader import cycle
from onda_tpu.data.metadata import load_dataset_info, load_table, scan_weather_cityscapes
from onda_tpu.data.splits import get_split

from .synthetic import make_synthetic_dataset

SIZE_WH = (64, 32)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("weather_cs"))
    make_synthetic_dataset(root, intensities=(0, 25), per_domain=4, size_wh=SIZE_WH)
    return root


@pytest.fixture(scope="module")
def info():
    return load_dataset_info()


def make_ds(root, info, frame):
    return SegmentationDataset(
        root, frame, dict(tuple(p) for p in info["label2train"]), SIZE_WH,
        mean=np.array([123.675, 116.28, 103.53]), std=np.array([58.395, 57.12, 57.375]),
    )


def test_scan_matches_saved_metadata(dataset_root):
    table = load_table(f"{dataset_root}/metadata.json")
    scanned = scan_weather_cityscapes(dataset_root, "rain")
    assert len(scanned) == len(table) == 16
    assert set(scanned["intensity"]) == {0, 25}


def test_split_buckets(dataset_root):
    table = load_table(f"{dataset_root}/metadata.json")
    split = get_split(table, "intensity", [(0,)], [(0,), (25,)])
    assert len(split["train"][(0,)]) == 4
    assert len(split["val"][(25,)]) == 4
    merged = get_split(table, "intensity", [(0, 25)], [(0, 25)])
    assert len(merged["train"][(0, 25)]) == 8
    # valset EMPTY = the video-builder signature: the whole scene becomes the
    # train stream, train/val column ignored (reference
    # weather_cityscapes_video_sets.py:26-31 — no `set` filter at all)
    stream = get_split(table, "intensity", [(0, 25)], [])
    assert len(stream["train"][(0, 25)]) == 16


def test_sample_contents(dataset_root, info):
    table = load_table(f"{dataset_root}/metadata.json")
    ds = make_ds(dataset_root, info, table[table["set"] == "train"])
    sample = ds[0]
    w, h = SIZE_WH
    assert sample["image"].shape == (h, w, 3)
    assert sample["label"].shape == (h, w)
    assert sample["label_res"].shape == (h // 8 + 1, w // 8 + 1)
    # labels remapped into {0..18, 255}
    vals = set(np.unique(sample["label"]))
    assert vals <= set(range(19)) | {255}
    assert np.isfinite(sample["image"]).all()


def test_preprocess_parity_with_reference(dataset_root, info):
    """BGR flip + normalize matches the reference transform composition
    (reference segmentation_db.py:11-13,97-99)."""
    table = load_table(f"{dataset_root}/metadata.json")
    ds = make_ds(dataset_root, info, table[table["set"] == "train"])
    from PIL import Image

    from onda_tpu.data.segmentation import load_image, normalize_image

    raw = load_image(ds.metadata.iloc[0]["image_path"].replace("leftImg8bit/", f"{dataset_root}/leftImg8bit/"), SIZE_WH, Image.BICUBIC, rgb=True)
    mean = np.array([123.675, 116.28, 103.53])
    std = np.array([58.395, 57.12, 57.375])
    # inline oracle for torchvision ToTensor + Normalize(mean/255, std/255) on the
    # BGR-flipped uint8 image (torchvision isn't installed here)
    bgr = raw[:, :, ::-1].astype(np.float32) / 255.0  # ToTensor: /255
    want = (np.moveaxis(bgr, -1, 0) - (mean / 255)[:, None, None]) / (std / 255)[:, None, None]
    got = normalize_image(raw, mean, std)
    np.testing.assert_allclose(np.moveaxis(got, -1, 0), want, rtol=1e-5, atol=1e-6)


def test_loader_shapes_and_padding(dataset_root, info):
    table = load_table(f"{dataset_root}/metadata.json")
    ds = make_ds(dataset_root, info, table[table["set"] == "train"])  # 8 samples
    train = Loader(ds, batch_size=3, shuffle=True, drop_last=True)
    batches = list(train)
    assert len(train) == 2 and len(batches) == 2
    assert all(b["image"].shape[0] == 3 for b in batches)
    ev = Loader(ds, batch_size=3, pad_last=True)
    batches = list(ev)
    assert len(batches) == 3
    assert batches[-1]["image"].shape[0] == 3 and batches[-1]["valid"] == 2
    # cycle reshuffles endlessly
    it = cycle(train)
    assert next(it)["image"].shape == next(it)["image"].shape


def test_loader_prefetch_is_bounded():
    """Workers must not run ahead of consumption by more than the prefetch
    budget (an unbounded loader materializes the whole epoch in RAM)."""
    import threading
    import time

    produced = []

    class Probe:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            produced.append(i)
            return {"image": np.zeros((2, 2, 3), np.float32)}

    loader = Loader(Probe(), batch_size=1, num_threads=4, prefetch=3)
    it = iter(loader)
    next(it)
    time.sleep(0.2)  # give workers every chance to run ahead
    # 1 consumed + at most prefetch-budget outstanding (+1 per worker in flight)
    budget = max(loader.prefetch, loader.num_threads)
    assert len(produced) <= 1 + budget + loader.num_threads
    before = threading.active_count()
    del it  # abandon mid-epoch: workers parked on the budget must exit
    time.sleep(0.2)
    assert threading.active_count() <= before


def test_replay_buffer(dataset_root, info):
    table = load_table(f"{dataset_root}/metadata.json")
    ds = make_ds(dataset_root, info, table[table["set"] == "train"])
    buf = ReplayBuffer(ds, batch_size=2)
    assert len(buf) == 8
    batch = next(iter(buf))
    assert batch["image"].shape[0] == 2
    assert sum(1 for _ in buf.sequential()) == 8
    # queue eviction + add_from_batch
    batch["stored_predictions"] = batch["label_res"]
    first_path = buf.buffer[0]["image_path"]
    buf.add_from_batch(batch, 0)
    assert len(buf) == 8
    assert buf.buffer[-1]["domain"] == "target"
    assert buf.buffer[0]["image_path"] != first_path


def test_label_mapper_negative_key_does_not_clobber(info):
    """The cityscapes label2train table has a -1→255 row; it must land at the
    lut's end (numpy negative indexing, reference func.py:107-109), not on
    label 33 (bicycle→18)."""
    mapper = LabelMapper(dict(tuple(p) for p in info["label2train"]))
    out = mapper(np.array([[33, 7, 0]], np.int32))
    assert out[0, 0] == 18  # bicycle, not 255
    assert out[0, 1] == 0 and out[0, 2] == 255


def test_label_mapper_rgb():
    mapper = LabelMapper({(10, 20, 30): 5, (0, 0, 0): 1})
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = (10, 20, 30)
    out = mapper(img)
    assert out[0, 0] == 5 and out[1, 1] == 1


def test_video_datasets_are_train_only(tmp_path):
    """Both video datasets are train-only streams: the reference's split
    builders emit no "val" buckets at all (reference database_handler.py:21-42)."""
    import pandas as pd

    from onda_tpu.config import cfg_from_file, default_config
    from onda_tpu.registry import get_db

    rows = []
    for scene in ("source", "100mm_1"):
        for i in range(3):
            rows.append({
                "image_path": f"leftImg8bit/train/{scene}/x/{i}_leftImg8bit.png",
                "label_path": f"gtFine/train/x/{i}_gtFine_labelIds.png",
                "set": "train", "scene": scene,
            })
    pd.DataFrame(rows).to_json(str(tmp_path / "metadata_video.json"))

    cfg = default_config()
    cfg.SCHEME.DATASET = "rainy_cityscapes_video"
    cfg.SCHEME.COLUMN = "scene"
    cfg.SCHEME.SOURCE = [["source"]]
    cfg.SCHEME.DOMAIN_ORDER = [["100mm_1"]]
    cfg.SCHEME.PATH = str(tmp_path) + "/"
    cfg.SCHEME.FILTERS = {}
    db = get_db(cfg)
    assert len(db["domains_src"]) == 1 and len(db["domains_trg"]) == 1
    for bucket in db["domains_src"] + db["domains_trg"]:
        assert bucket["train"], "train split missing"
        assert not bucket.get("val"), "video datasets must not produce val sets"


def test_loader_propagates_worker_exception():
    """A failing sample (corrupt/missing image) must fail the epoch loudly —
    a silently-dead worker would park the consumer in cond.wait() forever."""
    import pytest

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise OSError("corrupt png")
            return {"image": np.zeros((2, 2, 3), np.float32)}

    loader = Loader(Broken(), batch_size=2, num_threads=2)
    with pytest.raises(OSError, match="corrupt png"):
        for _ in loader:
            pass
