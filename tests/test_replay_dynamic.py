"""Dynamic replay buffer (BUFFER_DYNAMIC): online pseudo-labeled insertions.

The reference's buffer refresh (prototypes.py:453-464 → buffer_db.py:96-104)
pushes target frames back into the source replay buffer with their upsampled
pseudo-labels. These tests pin the rebuilt semantics:

* buffer samples stay collate-uniform after insertions mix domains (the
  reference keeps a fixed key schema via type_dict, buffer_db.py:43-49);
* replayed target frames train against their PSEUDO labels at the 1/8 loss
  grid — never their ground truth;
* the full train loop inserts at the configured PERC_FILL_PER_DOMAIN rate.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from onda_tpu.config import cfg_from_file, default_config
from onda_tpu.data import Loader, SegmentationDataset
from onda_tpu.data.metadata import load_dataset_info
from onda_tpu.data.replay_buffer import ReplayBuffer
from onda_tpu.methods.proto_online import ProtoOnlineAdapter
from onda_tpu.models import build_deeplab_v2

from .synthetic import make_synthetic_dataset

W, H = 64, 32
C = 19


def make_ds(root, table, info):
    return SegmentationDataset(
        root, table, dict(tuple(p) for p in info["label2train"]), (W, H),
        mean=np.array([123.675, 116.28, 103.53]),
        std=np.array([58.395, 57.12, 57.375]),
    )


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("buf_ds"))
    table = make_synthetic_dataset(root, intensities=(0, 25), per_domain=4,
                                   size_wh=(W, H))
    return root, table, load_dataset_info()


def test_buffer_keys_stay_uniform_after_insertion(env):
    root, table, info = env
    src = table[(table["intensity"] == 0) & (table["set"] == "train")]
    buf = ReplayBuffer(make_ds(root, src, info), batch_size=2)
    assert all("stored_predictions" in s for s in buf.buffer)
    # initial stored_predictions = the 1/8-grid label_res (NOT the input-res
    # label the reference stores, which its own loss cannot consume)
    s0 = buf.buffer[0]
    np.testing.assert_array_equal(s0["stored_predictions"], s0["label_res"])

    hr, wr = H // 8 + 1, W // 8 + 1
    fake = {
        "image": np.zeros((2, H, W, 3), np.float32),
        "label": np.zeros((2, H, W), np.int32),
        "label_res": np.ones((2, hr, wr), np.int32),
        "stored_predictions": np.ones((2, hr, wr), np.int32),
        "image_path": ["a", "b"],
        "label_path": ["a", "b"],
        "an_extra_key_not_in_schema": np.zeros(2),
    }
    buf.add_from_batch(fake, 0)
    inserted = buf.buffer[-1]
    assert inserted["domain"] == "target"
    assert set(inserted) == set(buf.buffer[0])  # schema preserved, extras dropped
    # mixed batches collate in EVERY order across the ring (the pre-fix crash:
    # a target-first batch raised KeyError on stored_predictions)
    for _ in range(2 * len(buf.buffer)):
        batch = next(buf)
        assert batch["stored_predictions"].shape == (2, hr, wr)


@pytest.mark.slow
def test_online_insertions_replace_buffer_with_pseudo_labels(env, tmp_path):
    root, table, info = env
    src = table[(table["intensity"] == 0) & (table["set"] == "train")]
    trg = table[(table["intensity"] == 25) & (table["set"] == "train")]

    cfg = cfg_from_file("configs/hybrid_switch.yml", default_config())
    cfg.SCHEME.RESOLUTION = [W, H]
    cfg.OTHERS.SNAPSHOT_DIR = str(tmp_path / "snaps")
    cfg.TRAINING.BATCH_SIZE = 2
    cfg.TRAINING.REPLAY_BUFFER = 4
    cfg.TRAINING.BUFFER_DYNAMIC = True
    # probability = PERC_FILL * REPLAY_BUFFER / BATCH_SIZE / steps = 1.0:
    # every target frame of every step is inserted (steps = 1 epoch × 2 batches)
    cfg.TRAINING.PERC_FILL_PER_DOMAIN = 1.0
    spec = cfg.METHOD.ADAPTATION.PROTO_ONLINE_HYBRIDSWITCH
    spec.EPOCHS = 1
    spec.LOAD_PROTO = None
    spec.SKIP_CALC = False
    spec.set_ = "buf_test"

    model = build_deeplab_v2(num_classes=C, layers=(1, 1, 1, 1))
    variables = model.init(jax.random.key(0), jnp.zeros((1, H, W, 3)), train=False)
    adapter = ProtoOnlineAdapter(model, dict(variables), cfg, spec, num_classes=C)

    buf = ReplayBuffer(make_ds(root, src, info), batch_size=2)
    trg_ds = make_ds(root, trg, info)
    gt_res = {s["image_path"]: np.asarray(s["label_res"])
              for s in (trg_ds[i] for i in range(len(trg_ds)))}
    trg_loader = Loader(trg_ds, batch_size=2, shuffle=False,
                        drop_last=True, num_threads=1)
    adapter.train(buf, trg_loader, {})

    hr, wr = H // 8 + 1, W // 8 + 1
    targets = [s for s in buf.buffer if s["domain"] == "target"]
    # 2 steps × 2 frames at probability 1 = 4 insertions into a 4-slot FIFO
    assert len(targets) == len(buf.buffer) == 4
    for s in targets:
        assert s["stored_predictions"].shape == (hr, wr)
        assert s["label"].shape == (H, W)  # full-res pseudo label
        # the 1/8 training label IS the pseudo label, not the ground truth
        np.testing.assert_array_equal(s["label_res"], s["stored_predictions"])
        gt = gt_res.get(s["image_path"])
        if gt is not None and not np.array_equal(gt, s["stored_predictions"]):
            break  # at least one replayed frame differs from its GT → no leak
    else:
        pytest.fail("every pseudo label equals ground truth — GT leak suspected")
