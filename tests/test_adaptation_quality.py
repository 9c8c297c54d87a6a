"""Behavioral end-to-end: online adaptation must RECOVER accuracy under a
synthetic domain shift (the framework's reason to exist — SURVEY.md §6's
mIoU-recovery protocol in miniature).

A tiny DeepLab is source-pretrained on a color-coded segmentation task, the
colors are shifted for the target domain (accuracy drops), then hybrid-switch
online adaptation runs over the unlabeled target stream — target mIoU after
adaptation must beat the frozen source model's.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from onda_tpu.config import cfg_from_file, default_config
from onda_tpu.data import Loader, SegmentationDataset
from onda_tpu.data.metadata import load_dataset_info
from onda_tpu.methods.proto_online import ProtoOnlineAdapter
from onda_tpu.methods.segmentation import SegmentTrainer
from onda_tpu.models import build_deeplab_v2

from .synthetic import make_shift_dataset

W, H = 64, 32
C = 19  # full head; only 4 classes populated


def make_loader(root, table, info, batch, shuffle, train=True, seed=0):
    ds = SegmentationDataset(
        root, table, dict(tuple(p) for p in info["label2train"]), (W, H),
        mean=np.array([123.675, 116.28, 103.53]), std=np.array([58.395, 57.12, 57.375]),
    )
    return Loader(ds, batch_size=batch, shuffle=shuffle, seed=seed,
                  drop_last=train, pad_last=not train, num_threads=1)


@pytest.mark.slow
def test_online_adaptation_recovers_miou(tmp_path):
    root = str(tmp_path / "ds")
    info = load_dataset_info()
    src = make_shift_dataset(root, shift=0.0, seed=0)
    trg = make_shift_dataset(root, shift=0.6, seed=1)

    cfg = cfg_from_file("configs/hybrid_switch.yml", default_config())
    cfg.SCHEME.RESOLUTION = [W, H]
    cfg.OTHERS.SNAPSHOT_DIR = str(tmp_path / "snaps")
    cfg.TRAINING.BATCH_SIZE = 4

    model = build_deeplab_v2(num_classes=C, layers=(1, 1, 1, 1))
    variables = dict(model.init(jax.random.key(0), jnp.zeros((1, H, W, 3)), train=False))

    # --- source pretraining (SEGMENT, reference methods/segmentation.py) ----
    seg_spec = cfg.METHOD.PRETRAIN.SEGMENT
    seg_spec.EPOCHS = 100
    seg_spec.LEARNING_RATE = 0.03
    seg_spec.POWER = 0  # constant LR — poly decay starves the short toy run
    trainer = SegmentTrainer(model, variables, cfg, seg_spec, num_classes=C)
    src_train = lambda: make_loader(root, src[src["set"] == "train"], info, 4, True)
    trainer.train({"src": src_train()}, {})
    src_val = make_loader(root, src[src["set"] == "val"], info, 4, False, train=False)
    iu_src, _ = trainer.evaluate(src_val)
    miou_src = float(np.nanmean(iu_src[:4]))  # populated classes only
    assert miou_src > 0.6, f"pretraining failed to learn the toy task: {miou_src}"

    # --- frozen source model on the shifted target (the no-adaptation floor) -
    trg_val = lambda: make_loader(root, trg[trg["set"] == "val"], info, 4, False, train=False)
    iu_before, _ = trainer.evaluate(trg_val())
    miou_before = float(np.nanmean(iu_before[:4]))

    # --- online hybrid-switch adaptation over the unlabeled target stream ---
    spec = cfg.METHOD.ADAPTATION.PROTO_ONLINE_HYBRIDSWITCH
    spec.LOAD_PROTO = None
    spec.set_ = "shift60"
    spec.EPOCHS = 3
    spec.LEARNING_RATE = 2.5e-4
    spec.SKIP_CALC = False
    spec.AVG_MONITOR_SIZE = 8
    adapter = ProtoOnlineAdapter(
        model, {"params": trainer.params, "batch_stats": trainer.batch_stats},
        cfg, spec, num_classes=C,
    )
    adapter.train(
        make_loader(root, src[src["set"] == "train"], info, 4, True),
        make_loader(root, trg[trg["set"] == "train"], info, 4, True),
        {},
    )
    hist = adapter.evaluate(trg_val())
    miou_after = float(np.nanmean(hist["model"][:4]))

    print(f"source mIoU {miou_src:.3f}; target before {miou_before:.3f} after {miou_after:.3f}")
    assert miou_after > miou_before + 0.02, (miou_src, miou_before, miou_after)
