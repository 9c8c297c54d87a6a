"""End-to-end smoke: the full `train_ouda.py --cfg` path on a synthetic dataset
at smoke resolution — config → db → model → adaptation → eval → checkpoints
(the reference's own smoke strategy, SURVEY.md §4, with a real assertion gate)."""

import os
import sys

import numpy as np
import pytest

from .synthetic import make_synthetic_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e_ds"))
    make_synthetic_dataset(root, intensities=(0, 25), per_domain=4, size_wh=(64, 32))
    return root


def run_config(env, tmp_path, method_name, spec_over=None, cfg_over=None):
    import yaml as _yaml

    with open(os.path.join(REPO, "configs/hybrid_switch.yml")) as f:
        cfg = _yaml.safe_load(f)
    cfg["SCHEME"]["PATH"] = env + "/"
    cfg["SCHEME"]["RESOLUTION"] = [64, 32]
    cfg["SCHEME"]["DOMAIN_ORDER"] = [[25], [0]]
    cfg["TRAINING"]["BATCH_SIZE"] = 2
    cfg["TRAINING"]["REPLAY_BUFFER"] = 4
    cfg["OTHERS"]["SNAPSHOT_DIR"] = str(tmp_path / "snaps")
    cfg["OTHERS"]["NUM_WORKERS"] = 1
    cfg["MODEL"]["LOAD"] = None  # no pretrained checkpoint in the test env
    spec = cfg["METHOD"]["ADAPTATION"].pop("PROTO_ONLINE_HYBRIDSWITCH")
    spec["EPOCHS"] = 1
    spec["LOAD_PROTO"] = None
    spec.update(spec_over or {})
    cfg["METHOD"]["ADAPTATION"]["NAME"] = method_name
    cfg["METHOD"]["ADAPTATION"][method_name] = spec
    for key, val in (cfg_over or {}).items():
        node = cfg
        *path, last = key.split(".")
        for p in path:
            node = node.setdefault(p, {})
        node[last] = val
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(_yaml.safe_dump(cfg))

    sys.argv = ["train_ouda.py", f"--cfg={cfg_path}"]
    sys.path.insert(0, REPO)
    import train_ouda

    train_ouda.main()
    return cfg


@pytest.mark.slow
def test_hybrid_switch_end_to_end(env, tmp_path):
    cfg = run_config(env, tmp_path, "PROTO_ONLINE_HYBRIDSWITCH")
    snaps = cfg["OTHERS"]["SNAPSHOT_DIR"]
    # checkpoints + prototypes written
    assert os.path.isdir(os.path.join(snaps, "adapt_state"))
    assert any(f.startswith("proto_") for f in os.listdir(snaps))
    # metrics logged with the reference key names
    import json

    lines = [json.loads(l) for l in open(os.path.join(snaps, "metrics.jsonl"))]
    step_logs = [l for l in lines if "Total target loss" in l]
    assert step_logs, "no training-step logs"
    assert all(np.isfinite(l["Total target loss"]) for l in step_logs)
    eval_logs = [l for l in lines if any(k.startswith("Val mIoU model of") for k in l)]
    assert eval_logs, "no evaluation logs"


@pytest.mark.slow
def test_evaluation_mode(env, tmp_path):
    """EVALUATION mode: inference-only mIoU over all validation sets
    (reference train_ouda.py:159-182)."""
    import yaml as _yaml

    with open(os.path.join(REPO, "configs/validation.yml")) as f:
        cfg = _yaml.safe_load(f)
    cfg["SCHEME"].update(
        DATASET="rainy_cityscapes", PATH=env + "/", RESOLUTION=[64, 32],
        DOMAIN_ORDER=[[25]],
    )
    cfg["MODEL"]["LOAD"] = None
    cfg["MODEL"]["MULTI_LEVEL"] = False
    cfg["TRAINING"]["BATCH_SIZE"] = 2
    cfg["TRAINING"]["REPLAY_BUFFER"] = 4
    cfg["OTHERS"]["SNAPSHOT_DIR"] = str(tmp_path / "snaps")
    cfg["METHOD"]["PRETRAIN"]["EVALUATION"].pop("PREDICTION_SAVE", None)
    spec = cfg["METHOD"]["ADAPTATION"]["PROTO_ONLINE"]
    spec["LOAD_PROTO"] = None
    spec["SKIP_PROTO_EVAL"] = True
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(_yaml.safe_dump(cfg))

    sys.argv = ["train_ouda.py", f"--cfg={cfg_path}"]
    sys.path.insert(0, REPO)
    import importlib

    import train_ouda
    importlib.reload(train_ouda)
    train_ouda.main()
    import json

    lines = [json.loads(l) for l in open(os.path.join(str(tmp_path / "snaps"), "metrics.jsonl"))]
    assert any(any(k.startswith("Val mIoU model of") for k in l) for l in lines)


@pytest.mark.slow
def test_advent_end_to_end(env, tmp_path):
    """ADVENT baseline through the real CLI: adversarial step logs + the
    advent_state (model + both discriminators + 3 optimizers) checkpoint
    (reference advent_da.py:130-214, train_ouda.py domain loop)."""
    import yaml as _yaml

    with open(os.path.join(REPO, "configs/advent.yml")) as f:
        cfg = _yaml.safe_load(f)
    cfg["SCHEME"].update(PATH=env + "/", RESOLUTION=[64, 32], DOMAIN_ORDER=[[25]])
    cfg["TRAINING"].update(BATCH_SIZE=2, REPLAY_BUFFER=4)
    cfg["OTHERS"].update(SNAPSHOT_DIR=str(tmp_path / "snaps"), NUM_WORKERS=1)
    cfg["MODEL"].update(LOAD=None, MULTI_LEVEL=False)
    spec = cfg["METHOD"]["ADAPTATION"]["ADVENT"]
    spec.update(EPOCHS=1, LOAD_PROTO=None)
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(_yaml.safe_dump(cfg))

    sys.argv = ["train_ouda.py", f"--cfg={cfg_path}"]
    sys.path.insert(0, REPO)
    import importlib

    import train_ouda
    importlib.reload(train_ouda)
    train_ouda.main()

    import json

    snaps = str(tmp_path / "snaps")
    assert os.path.isdir(os.path.join(snaps, "advent_state"))
    lines = [json.loads(l) for l in open(os.path.join(snaps, "metrics.jsonl"))]
    steps = [l for l in lines if "Adversarial loss" in l]
    assert steps, "no ADVENT step logs"
    # reference key names (advent_da.py:179-181)
    for key in ("Segmentation loss", "Discriminator loss"):
        assert all(np.isfinite(l[key]) for l in steps), key


@pytest.mark.slow
def test_fog_dataset_end_to_end(env, tmp_path):
    """fog_cityscapes family: registry resolves metadata_fog.json; the fog
    hybrid-switch config (fog GRAY_AREA thresholds) runs the full domain loop
    (reference weather_cityscapes_fog_sets.py, configs/hybrid_switch_fog.yml)."""
    import shutil

    import yaml as _yaml

    # fog metadata shares the schema (intensity = visibility); the synthetic
    # rain table doubles as one — only the registry's filename differs
    shutil.copyfile(os.path.join(env, "metadata.json"),
                    os.path.join(env, "metadata_fog.json"))
    with open(os.path.join(REPO, "configs/hybrid_switch_fog.yml")) as f:
        cfg = _yaml.safe_load(f)
    cfg["SCHEME"].update(PATH=env + "/", RESOLUTION=[64, 32], DOMAIN_ORDER=[[25]])
    cfg["TRAINING"].update(BATCH_SIZE=2, REPLAY_BUFFER=4)
    cfg["OTHERS"].update(SNAPSHOT_DIR=str(tmp_path / "snaps"), NUM_WORKERS=1)
    cfg["MODEL"]["LOAD"] = None
    spec = cfg["METHOD"]["ADAPTATION"]["PROTO_ONLINE_HYBRIDSWITCH"]
    spec.update(EPOCHS=1, LOAD_PROTO=None)
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(_yaml.safe_dump(cfg))

    sys.argv = ["train_ouda.py", f"--cfg={cfg_path}"]
    sys.path.insert(0, REPO)
    import importlib

    import train_ouda
    importlib.reload(train_ouda)
    train_ouda.main()

    import json

    lines = [json.loads(l) for l in open(str(tmp_path / "snaps" / "metrics.jsonl"))]
    steps = [l for l in lines if "Total target loss" in l]
    assert steps and all(np.isfinite(l["Total target loss"]) for l in steps)
    assert any(any(k.startswith("Val mIoU model of") for k in l) for l in lines)


@pytest.mark.slow
def test_segment_pretraining_end_to_end(env, tmp_path):
    """SEGMENT mode through the real CLI — the reference's second execution
    mode (train_ouda.py:185-197): supervised source pretraining on the shipped
    `training_fog.yml` (CE main + aux, poly LR), writing a `model_train_*`
    student checkpoint and per-epoch mIoU / mean-entropy eval keys
    (reference methods/segmentation.py:62-151), then continuing into the UDA
    domain loop with the pretrained weights."""
    import shutil

    import yaml as _yaml

    shutil.copyfile(os.path.join(env, "metadata.json"),
                    os.path.join(env, "metadata_fog.json"))
    with open(os.path.join(REPO, "configs/training_fog.yml")) as f:
        cfg = _yaml.safe_load(f)
    cfg["SCHEME"].update(PATH=env + "/", RESOLUTION=[64, 32], DOMAIN_ORDER=[[25]])
    cfg["TRAINING"].update(BATCH_SIZE=2, REPLAY_BUFFER=4)
    cfg["OTHERS"].update(SNAPSHOT_DIR=str(tmp_path / "snaps"), NUM_WORKERS=1)
    cfg["MODEL"].update(LOAD=None, MULTI_LEVEL=False)
    cfg["METHOD"]["PRETRAIN"]["SEGMENT"]["EPOCHS"] = 1
    spec = cfg["METHOD"]["ADAPTATION"]["PROTO_ONLINE_HYBRIDSWITCH"]
    spec.update(EPOCHS=1, LOAD_PROTO=None)
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(_yaml.safe_dump(cfg))

    sys.argv = ["train_ouda.py", f"--cfg={cfg_path}"]
    sys.path.insert(0, REPO)
    import importlib

    import train_ouda
    importlib.reload(train_ouda)
    train_ouda.main()

    import json

    snaps = str(tmp_path / "snaps")
    # pretraining checkpoint (student-only, named after the source set)
    assert any(f.startswith("model_train") for f in os.listdir(snaps))
    lines = [json.loads(l) for l in open(os.path.join(snaps, "metrics.jsonl"))]
    seg_steps = [l["Segmentation loss"] for l in lines if "Segmentation loss" in l]
    assert seg_steps and all(np.isfinite(v) for v in seg_steps)
    assert any(any(k.startswith("val entropy of") for k in l) for l in lines)
    assert any(any(k.startswith("Val mIoU of") for k in l) for l in lines)
    # and the UDA phase ran after pretraining
    assert os.path.isdir(os.path.join(snaps, "adapt_state"))
    assert any("Total target loss" in l for l in lines)


@pytest.mark.slow
def test_prediction_save_mode(env, tmp_path):
    """EVALUATION + PREDICTION_SAVE: per-target-domain logits dumped as
    reference-format NCHW torch .pt batches + confidence/progress logs
    (reference adaptation_model.py:218-249, train_ouda.py:164-174)."""
    import yaml as _yaml

    with open(os.path.join(REPO, "configs/validation.yml")) as f:
        cfg = _yaml.safe_load(f)
    cfg["SCHEME"].update(
        DATASET="rainy_cityscapes", PATH=env + "/", RESOLUTION=[64, 32],
        DOMAIN_ORDER=[[25]],
    )
    cfg["MODEL"]["LOAD"] = None
    cfg["MODEL"]["MULTI_LEVEL"] = False
    cfg["TRAINING"]["BATCH_SIZE"] = 2
    cfg["TRAINING"]["REPLAY_BUFFER"] = 4
    cfg["OTHERS"]["SNAPSHOT_DIR"] = str(tmp_path / "snaps")
    cfg["METHOD"]["PRETRAIN"]["EVALUATION"]["PREDICTION_SAVE"] = str(tmp_path / "preds")
    spec = cfg["METHOD"]["ADAPTATION"]["PROTO_ONLINE"]
    spec["LOAD_PROTO"] = None
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(_yaml.safe_dump(cfg))

    sys.argv = ["train_ouda.py", f"--cfg={cfg_path}"]
    sys.path.insert(0, REPO)
    import importlib

    import train_ouda
    importlib.reload(train_ouda)
    train_ouda.main()

    import glob
    import json

    import torch

    dumps = glob.glob(str(tmp_path / "preds" / "*" / "batch-*.pt"))
    assert dumps, "no prediction batches dumped"
    logits = torch.load(sorted(dumps)[0])
    # reference format: NCHW float logits, C=19 at axis 1, 1/8+1 output grid
    assert logits.ndim == 4 and logits.shape[1] == 19
    assert logits.shape[2] == 32 // 8 + 1 and logits.shape[3] == 64 // 8 + 1
    assert torch.isfinite(logits).all()
    lines = [json.loads(l) for l in open(str(tmp_path / "snaps" / "metrics.jsonl"))]
    assert any("Prediction confidence" in l and "Progress" in l for l in lines)


@pytest.mark.slow
def test_auto_dynamic_refresh(env, tmp_path):
    """AUTO_DYNAMIC: dynamic teacher refreshes from the student when the
    static-confidence derivative moves (reference prototypes.py:396-405).
    AVG_MONITOR_SIZE is shrunk so dev_avg becomes non-zero within the run."""
    cfg = run_config(
        env, tmp_path, "PROTO_ONLINE_HYBRIDSWITCH",
        spec_over={
            "AUTO_DYNAMIC": True, "AUTO_DYNAMIC_PATIENCE": 1,
            "AVG_MONITOR_SIZE": 3, "DEV_THRESH": 1e-9, "EPOCHS": 2,
        },
    )
    import json

    snaps = cfg["OTHERS"]["SNAPSHOT_DIR"]
    lines = [json.loads(l) for l in open(os.path.join(snaps, "metrics.jsonl"))]
    devs = [l["dev avg prior static"] for l in lines if "dev avg prior static" in l]
    assert devs and any(abs(d) > 0 for d in devs)  # the trigger signal moved


@pytest.mark.slow
def test_auto_resume(env, tmp_path, capsys):
    """OTHERS.AUTO_RESUME: a rerun restores the newest full-state snapshot
    (exact resume — optimizer/EMA/prototypes/monitors included) and skips the
    prototype bootstrap."""
    cfg = run_config(env, tmp_path, "PROTO_ONLINE_HYBRIDSWITCH")
    # a crash DURING a save leaves a partial snapshot newer than the good one —
    # resume must fall back to the newest LOADABLE snapshot, not die on it
    import time

    time.sleep(0.01)
    partial = os.path.join(cfg["OTHERS"]["SNAPSHOT_DIR"], "adapt_state_step9999")
    os.makedirs(partial, exist_ok=True)
    capsys.readouterr()
    cfg2 = run_config(
        env, tmp_path, "PROTO_ONLINE_HYBRIDSWITCH",
        cfg_over={"OTHERS.AUTO_RESUME": True},
    )
    out = capsys.readouterr().out
    assert "AUTO_RESUME skip: adapt_state_step9999" in out
    assert "AUTO_RESUME: restoring" in out
    assert "Computing Prototypes" not in out  # bootstrap skipped on resume
    assert cfg2["OTHERS"]["SNAPSHOT_DIR"] == cfg["OTHERS"]["SNAPSHOT_DIR"]


@pytest.mark.slow
def test_external_video_labelless(tmp_path):
    """The live label-less streaming path (reference bern_video, SURVEY.md
    §2.12): adapt on an unlabeled `video` scene with a labeled `clear` source —
    no validation sets exist, the hybrid policy must tolerate batches without
    labels (reference prototypes_hybrid_switch.py:49-50)."""
    from .synthetic import make_bern_dataset

    root = str(tmp_path / "bern_ds")
    make_bern_dataset(root, n_clear=4, n_video=4, size_wh=(64, 32))

    import yaml as _yaml

    with open(os.path.join(REPO, "configs/external_video.yml")) as f:
        cfg = _yaml.safe_load(f)
    cfg["SCHEME"]["PATH"] = root + "/"
    cfg["SCHEME"]["RESOLUTION"] = [64, 32]
    cfg["TRAINING"]["BATCH_SIZE"] = 2
    cfg["TRAINING"]["REPLAY_BUFFER"] = 4
    cfg["OTHERS"]["SNAPSHOT_DIR"] = str(tmp_path / "snaps")
    cfg["OTHERS"]["NUM_WORKERS"] = 1
    cfg["MODEL"]["LOAD"] = None
    spec = cfg["METHOD"]["ADAPTATION"]["PROTO_ONLINE_HYBRIDSWITCH"]
    spec["EPOCHS"] = 1
    spec["LOAD_PROTO"] = None
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(_yaml.safe_dump(cfg))

    sys.argv = ["train_ouda.py", f"--cfg={cfg_path}"]
    sys.path.insert(0, REPO)
    import train_ouda

    train_ouda.main()

    import json

    snaps = cfg["OTHERS"]["SNAPSHOT_DIR"]
    lines = [json.loads(l) for l in open(os.path.join(snaps, "metrics.jsonl"))]
    step_logs = [l for l in lines if "Total target loss" in l]
    assert step_logs and all(np.isfinite(l["Total target loss"]) for l in step_logs)
    # no labels on the video scene → no validation keys at all
    assert not any(k.startswith("Val mIoU") for l in lines for k in l)


@pytest.mark.slow
def test_eval_sweep(env, tmp_path, capsys):
    """OTHERS.EVAL_SWEEP: EVALUATION mode evaluates every checkpoint in the
    snapshot dir and reports the best (the reference's legacy eval_single /
    eval_best snapshot sweeper, reference eval_UDA.py:77-198)."""
    cfg = run_config(env, tmp_path, "PROTO_ONLINE_HYBRIDSWITCH")
    # a partial/corrupt snapshot in the same dir (here: an empty advent_state
    # dir, as left by a crashed writer) must be skipped, not crash the sweep
    os.makedirs(os.path.join(cfg["OTHERS"]["SNAPSHOT_DIR"], "advent_state"), exist_ok=True)
    capsys.readouterr()
    run_config(
        env, tmp_path, "PROTO_ONLINE_HYBRIDSWITCH",
        cfg_over={
            "METHOD.PRETRAIN.NAME": "EVALUATION",
            "OTHERS.EVAL_SWEEP": True,
        },
    )
    out = capsys.readouterr().out
    assert "sweep: adapt_state" in out
    # the UDA run also leaves the reference's post-SEGMENT artifact
    # (model_train_{src}_after_src_training.pth, train_ouda.py) — the sweeper
    # must evaluate it too, exactly like the reference's eval_best sweeps
    # every .pth in the dir (eval_UDA.py:77-198)
    assert "sweep: model_train_[[0]]_after_src_training.pth" in out
    assert "best: " in out and " mIoU" in out
    assert "sweep skip: advent_state" in out
    assert "sweep: advent_state" not in out
    import json

    snaps = cfg["OTHERS"]["SNAPSHOT_DIR"]
    lines = [json.loads(l) for l in open(os.path.join(snaps, "metrics.jsonl"))]
    assert any("Best mIoU" in l for l in lines)


def test_newest_checkpoint_filters_incompatible(tmp_path):
    """AUTO_RESUME / EVALUATION checkpoint discovery must only match state
    trees the loading adapter can restore; exact resume skips student-only
    model_train / .pth checkpoints."""
    import time

    from onda_tpu.methods.evaluation import EvaluationRunner

    for name in ("model_train_['clear']", "advent_state", "adapt_state"):
        (tmp_path / name).mkdir()
        time.sleep(0.01)
    (tmp_path / "old.pth").write_bytes(b"x")
    # an in-progress orbax write must never be picked, even though it
    # startswith-matches the prefix and is the newest entry
    time.sleep(0.01)
    (tmp_path / "adapt_state.orbax-checkpoint-tmp-123").mkdir()

    # EvaluationRunner: newest compatible is the .pth (most recent)
    newest = EvaluationRunner._newest_checkpoint(str(tmp_path))
    assert newest.endswith("old.pth")
    # exact-resume discovery (train_ouda AUTO_RESUME): orbax dirs only,
    # matched to the adapter's state tree
    newest = EvaluationRunner._newest_checkpoint(
        str(tmp_path), prefixes=("adapt_state",), allow_pth=False
    )
    assert newest.endswith("adapt_state")
    newest = EvaluationRunner._newest_checkpoint(
        str(tmp_path), prefixes=("advent_state",), allow_pth=False
    )
    assert newest.endswith("advent_state")
    # empty-match case returns None rather than an incompatible checkpoint
    assert EvaluationRunner._newest_checkpoint(
        str(tmp_path), prefixes=("nonexistent",), allow_pth=False
    ) is None


@pytest.mark.slow
def test_vswitch_end_to_end(env, tmp_path):
    """Confidence-DERIVATIVE switch (PROTO_ONLINE_VSWITCH) through the real
    CLI — the last prototype method family without CLI-level coverage
    (reference prototypes_vswitch.py; config confidence_der_switch.yml)."""
    import json

    run_config(
        env, tmp_path, "PROTO_ONLINE_VSWITCH",
        spec_over={"DEV_THRESH": 2.0e-4, "STATIC_LAMBDA": 1.0, "DYNAMIC_LAMBDA": 1.0},
    )
    snaps = str(tmp_path / "snaps")
    assert os.path.isdir(os.path.join(snaps, "adapt_state"))
    lines = [json.loads(l) for l in open(os.path.join(snaps, "metrics.jsonl"))]
    steps = [l for l in lines if "Total target loss" in l]
    assert steps and all(np.isfinite(l["Total target loss"]) for l in steps)
    # the derivative state machine's monitored signal (reference vswitch: dev
    # of the static-confidence MA drives the 2-state switch)
    assert all(np.isfinite(l["dev avg prior static"]) for l in steps)


@pytest.mark.slow
def test_proto_advent_end_to_end(env, tmp_path):
    """PROTO_ADVENT (hswitch prototypes + adversarial entropy in one step)
    through the real CLI from the shipped config: adversarial + prototype
    loss keys, prototype pickles, per-epoch sample images, full-state
    checkpoint (reference prototype_advent.py:23-198)."""
    import glob
    import json

    import yaml as _yaml

    with open(os.path.join(REPO, "configs/proto_advent.yml")) as f:
        cfg = _yaml.safe_load(f)
    cfg["SCHEME"].update(PATH=env + "/", RESOLUTION=[64, 32], DOMAIN_ORDER=[[25]])
    cfg["TRAINING"].update(BATCH_SIZE=2, REPLAY_BUFFER=4)
    cfg["OTHERS"].update(SNAPSHOT_DIR=str(tmp_path / "snaps"), NUM_WORKERS=1)
    cfg["MODEL"].update(LOAD=None, MULTI_LEVEL=False)
    spec = cfg["METHOD"]["ADAPTATION"]["PROTO_ADVENT"]
    spec.update(EPOCHS=1, LOAD_PROTO=None)
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(_yaml.safe_dump(cfg))

    sys.argv = ["train_ouda.py", f"--cfg={cfg_path}"]
    sys.path.insert(0, REPO)
    import importlib

    import train_ouda
    importlib.reload(train_ouda)
    train_ouda.main()

    snaps = str(tmp_path / "snaps")
    assert os.path.isdir(os.path.join(snaps, "adapt_state"))
    assert glob.glob(os.path.join(snaps, "proto_*.pickle"))
    lines = [json.loads(l) for l in open(os.path.join(snaps, "metrics.jsonl"))]
    steps = [l for l in lines if "Adversarial loss" in l]
    assert steps, "no PROTO_ADVENT step logs"
    for key in ("Total target loss", "Discriminator loss", "pseudolabel_pixel_num"):
        assert all(np.isfinite(l[key]) for l in steps), key
    # per-epoch sample images (reference prototype_advent.py:195); their
    # "Condition {set} sample {n}" keys are wandb-only (paths are not scalars,
    # so the JSONL sink drops them) — assert the rendered PNGs themselves
    assert glob.glob(os.path.join(snaps, "samples", "*.png"))
