"""SEGMENT pretraining trajectory parity vs the reference's assembled trainer.

Round-2 verdict missing #2: the five adaptation methods have assembled-class
oracles, the supervised source trainer did not. This drives the reference's
`segmentation.train` (reference framework/domain_adaptation/methods/
segmentation.py:18-138) END TO END — its own loop, optimizer construction,
poly-LR adjust, windowed loss logging and per-epoch `evaluate_model` — against
`SegmentTrainer.train` on identical weights and batches, and compares:

  * the logged "Segmentation loss" window means + "learning_rate" sequence
    (incl. the reference's adjust-AFTER-step semantics: step i trains at
    lr(i-1) while lr(i) is logged);
  * per-epoch "Val mIoU of {set}" / "Val std IoU of {set}" / "val entropy";
  * final parameters (drift-vs-movement, as the adaptation oracles do).

`segment_sample` is stubbed out on the reference side (it needs the palette /
wandb.Image plumbing that tests/test_logging.py covers on ours); everything
else runs the reference code verbatim. Dropout is disabled on both sides.
"""

import numpy as np
import pytest
import jax

from onda_tpu.config import cfg_from_file, default_config

from .oracle import import_reference
from .test_ref_step_parity import compare_state_dicts
from .torch_ref import (build_pair, stub_addict, stub_cuda_events, stub_wandb,
                        torch17_sgd_semantics)

torch = pytest.importorskip("torch")

B, H, W, C = 2, 64, 128, 19
N_BATCHES, EPOCHS = 8, 2  # 16 steps: crosses the step-10 log window boundary


def make_batches(seed, n, b=B, ignore_frac=0.1):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        lbl = rng.integers(0, C, size=(b, H, W)).astype(np.int64)
        lbl[rng.random(lbl.shape) < ignore_frac] = 255
        out.append({
            "image": (rng.normal(size=(b, H, W, 3)) * 0.5).astype(np.float32),
            "label": lbl,
        })
    return out


def torchify(batch):
    return {
        "image": torch.from_numpy(np.moveaxis(batch["image"], -1, 1).copy()),
        "label": torch.from_numpy(batch["label"]),
    }


def make_cfg(tmp_path):
    cfg = cfg_from_file("configs/hybrid_switch.yml", default_config())
    cfg.SCHEME.RESOLUTION = [W, H]
    cfg.SCHEME.ORIGINAL_RES = {}
    spec = cfg.METHOD.PRETRAIN.SEGMENT
    spec.EPOCHS = EPOCHS  # POWER stays at the shipped 0.9: exercises poly LR
    cfg.OTHERS.SNAPSHOT_DIR = str(tmp_path)
    cfg.OTHERS.DEVICE = "cpu"
    cfg.OTHERS.DATA_PARALLEL = 1
    cfg.OTHERS.ASYNC_SAVE = False
    cfg.NUM_CLASSES = C  # the reference CLI injects this from dataset info
    cfg.device = "cpu"  # evaluate_model's `transfer` reads cfg.device
    return cfg, spec


class RecordingLogger:
    def __init__(self):
        self.records = []

    def log(self, metrics):
        self.records.append(dict(metrics))


@pytest.mark.slow
def test_segment_trajectory_parity(tmp_path):
    cfg, spec = make_cfg(tmp_path)
    # multi_level=True so the aux head contributes its 0.1-weighted CE
    # (reference segmentation.py:74-79)
    tmodel, fmodel, variables = build_pair(H=H, W=W, droprate=0.0, multi_level=True)
    init_sd = {k: v.detach().clone().numpy() for k, v in tmodel.state_dict().items()}
    train_batches = make_batches(seed=11, n=N_BATCHES)
    # evaluate_model iterates the loader; the epoch-0 sample block additionally
    # draws 10 items from a fresh iterator — give it exactly 10 1-image batches
    val_batches = make_batches(seed=12, n=10, b=1)

    # ---- reference side ----------------------------------------------------
    wandb = stub_wandb()
    stub_cuda_events()
    stub_addict()
    ref_logs = []
    wandb.log = lambda d, *a, **k: ref_logs.append(
        {key: v for key, v in d.items() if isinstance(v, (int, float, np.floating))}
    )
    seg = import_reference("framework.domain_adaptation.methods.segmentation")
    seg.wandb = wandb
    seg.segment_sample = lambda *a, **k: None  # palette/wandb.Image plumbing
    # train() constructs its own SGD; wrap the class so every instance gets the
    # torch-1.7.1 duplicate-param momentum semantics our optimizer reproduces
    real_sgd = torch.optim.SGD

    class SGD17(real_sgd):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            torch17_sgd_semantics(self)

    seg.torch.optim.SGD = SGD17
    try:
        tmodel.train()
        seg.train(
            tmodel,
            {"src": [torchify(b) for b in train_batches]},
            {"src": [torchify(b) for b in val_batches]},
            cfg, spec,
        )
    finally:
        seg.torch.optim.SGD = real_sgd

    # ---- our side ----------------------------------------------------------
    from onda_tpu.methods.segmentation import SegmentTrainer

    logger = RecordingLogger()
    ours = SegmentTrainer(fmodel, dict(variables), cfg, spec, num_classes=C,
                          logger=logger)
    ours.train({"src": train_batches}, {"src": val_batches})

    # ---- logged step metrics -----------------------------------------------
    ref_steps = [r for r in ref_logs if "Segmentation loss" in r]
    our_steps = [r for r in logger.records if "Segmentation loss" in r]
    assert len(ref_steps) == len(our_steps) == (N_BATCHES * EPOCHS + 9) // 10
    for i, (r, o) in enumerate(zip(ref_steps, our_steps)):
        # window means: step 0 is pre-drift (tight); later windows compound
        tol = 3e-3 if i == 0 else 6e-2
        np.testing.assert_allclose(o["Segmentation loss"], r["Segmentation loss"],
                                   rtol=tol, err_msg=f"loss window {i}")
        np.testing.assert_allclose(o["learning_rate"], r["learning_rate"],
                                   rtol=1e-6, err_msg=f"lr at log {i}")

    # ---- per-epoch evaluation ----------------------------------------------
    ref_evals = [r for r in ref_logs if "Val mIoU of src" in r]
    our_evals = [r for r in logger.records if "Val mIoU of src" in r]
    assert len(ref_evals) == len(our_evals) == EPOCHS
    for i, (r, o) in enumerate(zip(ref_evals, our_evals)):
        for key, tol in (("Val mIoU of src", 0.08), ("Val std IoU of src", 0.08),
                         ("val entropy of src", 0.05)):
            assert abs(o[key] - r[key]) <= tol * max(abs(r[key]), 0.02), (
                f"epoch {i} {key}: ref={r[key]} ours={o[key]}")

    # ---- final parameters (drift vs movement) ------------------------------
    from onda_tpu.models.import_torch import flax_to_torch_state_dict

    ref_sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    our_sd = flax_to_torch_state_dict(
        {"params": ours.params, "batch_stats": ours.batch_stats})
    compare_state_dicts(ref_sd, our_sd, init_sd)
