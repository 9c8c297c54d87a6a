"""Behavioral end-to-end: online adaptation must RECOVER accuracy under a
synthetic domain shift (the framework's reason to exist — SURVEY.md §6's
mIoU-recovery protocol in miniature).

A tiny DeepLab is source-pretrained on a color-coded segmentation task, the
colors are shifted for the target domain (accuracy drops), then hybrid-switch
online adaptation runs over the unlabeled target stream — target mIoU after
adaptation must beat the frozen source model's.

The adaptation stage runs in BOTH precision modes: f32 and bf16 (the headline
TPU fps is quoted in bf16 — docs/PERFORMANCE.md — so mIoU recovery must be
demonstrated in that same mode). Source pretraining is shared via a
module-scoped fixture, which also splits the old >20-min single test into
shorter units (suite hygiene, round-1 verdict #9).
"""

import os

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


def base_cfg(snapshot_dir):
    cfg = cfg_from_file("configs/hybrid_switch.yml", default_config())
    cfg.SCHEME.RESOLUTION = [W, H]
    cfg.OTHERS.SNAPSHOT_DIR = str(snapshot_dir)
    cfg.TRAINING.BATCH_SIZE = 4
    return cfg


@pytest.fixture(scope="module")
def pretrained(tmp_path_factory):
    """Source-pretrain once; both precision variants adapt from these weights."""
    tmp = tmp_path_factory.mktemp("adapt_quality")
    root = str(tmp / "ds")
    info = load_dataset_info()
    src = make_shift_dataset(root, shift=0.0, seed=0)
    trg = make_shift_dataset(root, shift=0.6, seed=1)

    cfg = base_cfg(tmp / "snaps")

    model = build_deeplab_v2(num_classes=C, layers=(1, 1, 1, 1))
    variables = dict(model.init(jax.random.key(0), jnp.zeros((1, H, W, 3)), train=False))

    # --- source pretraining (SEGMENT, reference methods/segmentation.py) ----
    seg_spec = cfg.METHOD.PRETRAIN.SEGMENT
    seg_spec.EPOCHS = 100
    # 0.01, not the original 0.03: the optimizer now replicates the reference
    # param generators' duplicate yields (methods/optim.py — effective backbone
    # LR ~3x), so the toy pretrain LR is rescaled to keep the same operating
    # point (source mIoU ~0.89; measured sweep 2026-08-19)
    seg_spec.LEARNING_RATE = 0.01
    seg_spec.POWER = 0  # constant LR — poly decay starves the short toy run
    trainer = SegmentTrainer(model, variables, cfg, seg_spec, num_classes=C)
    # the per-epoch orbax snapshot is pure fixture overhead here (100 sync
    # saves of a throwaway toy model); checkpointing has its own tests
    mp = pytest.MonkeyPatch()
    mp.setattr(SegmentTrainer, "save_model", lambda self: None)
    try:
        trainer.train({"src": make_loader(root, src[src["set"] == "train"], info, 4, True)}, {})
    finally:
        mp.undo()
    src_val = make_loader(root, src[src["set"] == "val"], info, 4, False, train=False)
    iu_src, _ = trainer.evaluate(src_val)
    miou_src = float(np.nanmean(iu_src[:4]))  # populated classes only
    assert miou_src > 0.6, f"pretraining failed to learn the toy task: {miou_src}"

    # --- frozen source model on the shifted target (the no-adaptation floor) -
    trg_val = make_loader(root, trg[trg["set"] == "val"], info, 4, False, train=False)
    iu_before, _ = trainer.evaluate(trg_val)
    miou_before = float(np.nanmean(iu_before[:4]))

    return {
        "root": root, "info": info, "src": src, "trg": trg, "tmp": tmp,
        "params": jax.device_get(trainer.params),
        "batch_stats": jax.device_get(trainer.batch_stats),
        "miou_src": miou_src, "miou_before": miou_before,
    }


@pytest.mark.slow
@pytest.mark.parametrize("precision", ["f32", "bf16"])
def test_online_adaptation_recovers_miou(pretrained, precision):
    """Hybrid-switch adaptation over the unlabeled target stream, in the same
    precision mode the headline throughput is quoted in (bf16) and in f32."""
    p = pretrained
    root, info, src, trg = p["root"], p["info"], p["src"], p["trg"]

    cfg = base_cfg(p["tmp"] / f"snaps_{precision}")
    cfg.OTHERS.PRECISION = precision
    dtype = jnp.bfloat16 if precision == "bf16" else None

    spec = cfg.METHOD.ADAPTATION.PROTO_ONLINE_HYBRIDSWITCH
    spec.LOAD_PROTO = None
    spec.set_ = f"shift60_{precision}"
    spec.EPOCHS = 3
    # adaptation LR stays the shipped hybrid_switch.yml value (1e-5): the
    # measured recovery curve peaks near it (f32 +0.04/+0.05 at 1e-5/2.5e-5,
    # bf16 +0.04/+0.03; ≥5e-5 under-recovers, ≥2.5e-4 degrades below the floor)
    assert float(spec.LEARNING_RATE) == 1e-5
    spec.SKIP_CALC = False
    spec.AVG_MONITOR_SIZE = 8

    model = build_deeplab_v2(num_classes=C, layers=(1, 1, 1, 1), dtype=dtype)
    adapter = ProtoOnlineAdapter(
        model, {"params": p["params"], "batch_stats": p["batch_stats"]},
        cfg, spec, num_classes=C,
    )
    adapter.train(
        make_loader(root, src[src["set"] == "train"], info, 4, True),
        make_loader(root, trg[trg["set"] == "train"], info, 4, True),
        {},
    )
    trg_val = make_loader(root, trg[trg["set"] == "val"], info, 4, False, train=False)
    hist = adapter.evaluate(trg_val)
    miou_after = float(np.nanmean(hist["model"][:4]))

    print(f"[{precision}] source mIoU {p['miou_src']:.3f}; target before "
          f"{p['miou_before']:.3f} after {miou_after:.3f}")
    assert miou_after > p["miou_before"] + 0.02, (
        precision, p["miou_src"], p["miou_before"], miou_after)


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("ONDA_TPU_TESTS") != "1",
                    reason="needs the real chip (~30-60 min); set ONDA_TPU_TESTS=1")
def test_full_resolution_bf16_quality_on_chip(tmp_path):
    """Opt-in chip gate (r4 verdict #6): the full 512×1024 bf16 quality run —
    tools/tpu_quality_run.py driving the REAL CLI end-to-end on the v5e —
    must show the heavy domain recovering under bf16 adaptation, with the
    measured floors from docs/PERFORMANCE.md (r4: heavy 0.0043→0.0189 ≈4.4×,
    source 0.175→0.11 retained). Writes the committed QUALITY_r<N>.json."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "QUALITY_r5.json")  # the committed round artifact
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the chip, not the test-suite cpu forcing
    env.pop("ONDA_QUALITY_OUT", None)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/tpu_quality_run.py")],
        env=env, capture_output=True, text=True, timeout=7200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    result = json.load(open(out))
    assert result["recovered"] is True, result
    # measured floors (well under the r4 observations of 0.0189 post-heavy
    # and 0.11 source-retained — a regression guard, not a noise tripwire)
    assert result["heavy_post"] > max(2 * result["heavy_pre"], 0.010), result
    assert result["source_post"] is None or result["source_post"] > 0.06, result
