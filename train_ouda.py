#!/usr/bin/env python
"""Online domain adaptation driver — `python train_ouda.py --cfg=<yaml>`.

Preserves the reference entrypoint + YAML schema + run semantics
(reference train_ouda.py:60-261):

* three modes by METHOD.PRETRAIN.NAME — EVALUATION (inference-only / prediction
  dumps), SEGMENT (supervised source pretraining), then UDA training;
* replay buffer sampled from source train data (float = fraction, int = count);
* ordered target-domain loop with per-domain cfg overrides (DOMAIN_OPTIONS /
  ORDER_OPTIONS) and `SKIP_CALC |= f_domain` so prototype bootstrap and
  pre-adaptation evaluation run only for the first domain — model/EMA/prototype/
  monitor state persists across domains.
"""

from __future__ import annotations

import argparse
import os
from pprint import pprint

import numpy as np


def get_arguments():
    parser = argparse.ArgumentParser(description="TPU-native online domain adaptation (OnDA)")
    parser.add_argument("--cfg", type=str, default=None, help="config file")
    parser.add_argument("--wandb", action="store_true", help="enable wandb logging")
    return parser.parse_args()


getf = lambda x: next(iter(x))


def main():
    try:
        _main()
    finally:
        # drain in-flight OTHERS.ASYNC_SAVE checkpoint writes BEFORE the
        # interpreter starts shutting down — concurrent.futures executors are
        # disabled during threading._shutdown, which runs before module atexit
        # hooks, so an atexit barrier is too late to rescue a pending write
        from onda_tpu.utils.checkpoint import wait_for_saves

        wait_for_saves()


def _main():
    args = get_arguments()
    assert args.cfg is not None, "Missing cfg file"

    # Honor an EXPLICIT platform choice. The ambient axon TPU plugin rewrites
    # jax_platforms to "axon,cpu" at import, overriding JAX_PLATFORMS=cpu from
    # the environment — and when the TPU tunnel is down the axon backend init
    # blocks indefinitely instead of failing over. Re-asserting the user's
    # value (before any backend is initialized) makes CPU runs hermetic.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from onda_tpu.config import cfg_from_file, default_config, unset
    from onda_tpu.data import Loader, ReplayBuffer, SegmentationDataset
    from onda_tpu.registry import get_adapt_method, get_db, get_model
    from onda_tpu.utils.logging_ import Logger

    # multi-host (DCN): bring up the JAX distributed runtime first (no-op on a
    # single host; see onda_tpu/parallel/distributed.py for the recipe)
    from onda_tpu.parallel import initialize as distributed_initialize

    distributed_initialize()

    cfg = cfg_from_file(args.cfg, default_config())
    print("Using config:")
    pprint(cfg.to_dict())

    np.random.seed(int(cfg.TRAINING.RANDOM_SEED))

    datasets = get_db(cfg)
    info = datasets["db_info"]
    cfg.classnum_to_label = info["classnum_to_label"]
    num_classes = len(info["label"])
    cfg.NUM_CLASSES = num_classes

    model, variables = get_model(cfg, num_classes)
    print("Model has been Loaded")

    logger = Logger(
        project="OUDA",
        config=cfg.to_dict(),
        log_dir=str(cfg.OTHERS.SNAPSHOT_DIR),
        use_wandb=args.wandb or None,
    )

    # NOTE: db_std is deliberately gated on SCHEME.MEAN (not STD) — the
    # reference does exactly this (reference train_ouda.py:101-110): setting
    # STD without MEAN is ignored there too. Parity over intuition.
    db_mean = info["mean"] if unset(cfg.SCHEME.MEAN) or cfg.SCHEME.MEAN is None else cfg.SCHEME.MEAN
    db_std = info["std"] if unset(cfg.SCHEME.MEAN) or cfg.SCHEME.MEAN is None else cfg.SCHEME.STD
    original = not (
        unset(cfg.SCHEME.ORIGINAL_RES) or cfg.SCHEME.ORIGINAL_RES == cfg.SCHEME.RESOLUTION
    )
    label2train = dict(tuple(pair) for pair in info["label2train"])

    def ds(frame):
        return SegmentationDataset(
            str(cfg.SCHEME.PATH),
            frame,
            label2train,
            cfg.SCHEME.RESOLUTION,
            mean=np.asarray(db_mean),
            std=np.asarray(db_std),
            original_label=original,
        )

    def dl(frame, shuffle, train=True):
        import jax

        batch = int(cfg.TRAINING.BATCH_SIZE)
        n_proc = jax.process_count()
        if n_proc > 1:
            # BATCH_SIZE is the GLOBAL batch: each host loads its own disjoint
            # metadata shard at the local batch size; the adapters' place_batch
            # assembles the shards into one globally-sharded jax.Array.
            # Every host MUST see the same number of rows — unequal loader
            # lengths desynchronize the hosts' collective step/eval calls —
            # so the tail rows that don't split evenly are dropped everywhere.
            if batch % n_proc:
                raise ValueError(f"BATCH_SIZE {batch} not divisible by {n_proc} hosts")
            per_host = len(frame) // n_proc
            frame = frame.iloc[jax.process_index()::n_proc].iloc[:per_host]
            batch //= n_proc
        return Loader(
            ds(frame),
            batch_size=batch,
            shuffle=shuffle,
            seed=int(cfg.TRAINING.RANDOM_SEED),
            drop_last=train,
            pad_last=not train,
            num_threads=max(int(cfg.OTHERS.NUM_WORKERS), 1),
        )

    import pandas as pd

    src_train = pd.concat(
        [getf(db["train"].values()) for db in datasets["domains_src"]]
    )
    source_dataloader = {"src": dl(src_train, bool(cfg.TRAINING.SHUFFLE))}

    validation_sets = {}
    source_val = {}
    if datasets["domains_src"] and datasets["domains_src"][0]["val"]:
        source_val = {
            getf(dom["val"].keys()): dl(getf(dom["val"].values()), False, train=False)
            for dom in datasets["domains_src"]
        }
        validation_sets.update(source_val)
        for trg_domain in datasets["domains_trg"]:
            set_ = getf(trg_domain["train"].keys())
            if trg_domain["val"]:
                validation_sets[set_] = dl(getf(trg_domain["val"].values()), False, train=False)

    # ---- EVALUATION mode -------------------------------------------------
    if cfg.METHOD.PRETRAIN.NAME == "EVALUATION":
        from onda_tpu.methods.evaluation import EvaluationRunner

        cfg_spec = cfg.METHOD.PRETRAIN["EVALUATION"]
        runner = EvaluationRunner(model, variables, cfg, _with_adapt_defaults(cfg, cfg_spec),
                                  num_classes, logger)
        if "PREDICTION_SAVE" in cfg_spec:
            for trg_domain in datasets["domains_trg"]:
                set_ = getf(trg_domain["train"].keys())
                runner.cfg_spec.set_ = set_
                runner.run_predictions(dl(getf(trg_domain["train"].values()), False, train=False))
        elif isinstance(cfg.OTHERS.EVAL_SWEEP, (bool, int, float)) and cfg.OTHERS.EVAL_SWEEP:
            # snapshot sweeper (reference eval_single/eval_best): evaluate every
            # checkpoint in SNAPSHOT_DIR, report the best; a number = keep
            # polling for new checkpoints for that many seconds of quiet
            wait = 0.0 if cfg.OTHERS.EVAL_SWEEP is True else float(cfg.OTHERS.EVAL_SWEEP)
            runner.sweep_checkpoints(validation_sets, wait_seconds=wait)
        else:
            logger.log(runner.evaluate_all(validation_sets))
        return

    # ---- SEGMENT source pretraining --------------------------------------
    if cfg.METHOD.PRETRAIN.NAME == "SEGMENT":
        if int(cfg.METHOD.PRETRAIN.SEGMENT.EPOCHS) > 0:
            from onda_tpu.methods.segmentation import SegmentTrainer

            trainer = SegmentTrainer(
                model, variables, cfg, cfg.METHOD.PRETRAIN.SEGMENT, num_classes, logger
            )
            # the reference evaluates pretraining on source AND all target val
            # sets: its `validation_sets = source_val_dataloader` line ALIASES
            # the dict, so the target val loaders appended afterwards are seen
            # by train_segment too (reference train_ouda.py:146-156, :190)
            trainer.train(source_dataloader, validation_sets)
            variables = {"params": trainer.params, "batch_stats": trainer.batch_stats}
        # reference train_ouda.py:185-197 + :51-57: after SEGMENT (even a
        # 0-epoch one — every published config ships NAME: SEGMENT, EPOCHS: 0)
        # the CLI checkpoints the source model as
        # model_train_{SOURCE}_after_src_training.pth. Exported in the
        # reference's own torch state_dict layout so its tooling can load it.
        import jax as _jax

        if _jax.process_index() == 0:
            snap_dir = str(cfg.OTHERS.SNAPSHOT_DIR)
            os.makedirs(snap_dir, exist_ok=True)
            pth_name = f"model_train_{cfg.SCHEME.SOURCE}_after_src_training.pth"
            try:
                from onda_tpu.models.import_torch import save_torch_checkpoint

                save_torch_checkpoint(variables, os.path.join(snap_dir, pth_name))
            except ImportError:  # torch-less deployment: orbax fallback
                from onda_tpu.utils import checkpoint as _ckpt

                _ckpt.save_state(variables, snap_dir, name=pth_name[:-4], wait=True)

    # ---- UDA training ----------------------------------------------------
    buff_size = cfg.TRAINING.REPLAY_BUFFER
    if isinstance(buff_size, float):
        src_sample = src_train.sample(frac=buff_size, random_state=int(cfg.TRAINING.RANDOM_SEED))
    else:
        src_sample = src_train.sample(
            n=min(int(buff_size), len(src_train)), random_state=int(cfg.TRAINING.RANDOM_SEED)
        )
    if buff_size == 0:
        src_loader = None
    elif isinstance(cfg.TRAINING.BUFFER_DYNAMIC, bool) and cfg.TRAINING.BUFFER_DYNAMIC:
        import jax as _jax

        # multi-host: each host keeps a disjoint buffer shard and draws its
        # local slice of every global replay batch (per-host seed)
        n_proc = _jax.process_count()
        if n_proc > 1:
            src_sample = src_sample.iloc[_jax.process_index()::n_proc]
        src_loader = ReplayBuffer(
            ds(src_sample), int(cfg.TRAINING.BATCH_SIZE) // n_proc,
            seed=int(cfg.TRAINING.RANDOM_SEED) + _jax.process_index(),
        )
        print(f"Buffer size: {src_loader.nbytes() / 1024**2:.1f} MB")
    else:
        src_loader = dl(src_sample, True)
    print("Starting UDA")

    cfg_spec = cfg.METHOD.ADAPTATION[cfg.METHOD.ADAPTATION.NAME]
    adapter = get_adapt_method(cfg)(model, variables, cfg, cfg_spec, num_classes, logger)
    # crash recovery: restore the newest full-state snapshot (model + EMA/static/
    # dynamic + optimizer + prototypes + monitors — exact resume, unlike the
    # reference's student-only manual reload; SURVEY.md §5.3/5.4)
    if (isinstance(cfg.OTHERS.AUTO_RESUME, bool) and cfg.OTHERS.AUTO_RESUME
            and hasattr(adapter, "load_model")):
        from onda_tpu.methods.evaluation import EvaluationRunner

        snap_dir = str(cfg.OTHERS.SNAPSHOT_DIR)
        # exact-resume snapshots only, matched to THIS adapter's state tree:
        # advent_state for ADVENT, adapt_state otherwise (.pth / model_train
        # are student-only checkpoints — not crash-recovery state)
        resume_prefix = (
            ("advent_state",) if cfg.METHOD.ADAPTATION.NAME == "ADVENT" else ("adapt_state",)
        )
        candidates = (
            EvaluationRunner._checkpoints_by_mtime(
                snap_dir, prefixes=resume_prefix, allow_pth=False
            ) if os.path.isdir(snap_dir) else []
        )
        # newest first; fall back past a partial snapshot — a crash DURING a
        # checkpoint save is exactly the scenario AUTO_RESUME exists for
        for cand in candidates[::-1]:
            try:
                adapter.load_model(str(cand))
            except Exception as exc:
                print(f"AUTO_RESUME skip: {cand.name} (unloadable: {type(exc).__name__})")
                continue
            print(f"AUTO_RESUME: restoring {cand}")
            if hasattr(adapter, "skip_proto"):
                adapter.skip_proto = True
            break
    f_domain = False
    for order, trg_domain in enumerate(datasets["domains_trg"]):
        set_ = getf(trg_domain["train"].keys())
        trg_loader = dl(getf(trg_domain["train"].values()), bool(cfg.TRAINING.SHUFFLE) or unset(cfg.TRAINING.SHUFFLE))
        validation_method = cfg.OTHERS.VALIDATION
        if validation_method == "all":
            val_set = validation_sets
        elif validation_method == "single":
            val_set = {set_: dl(getf(trg_domain["val"].values()), False, train=False)}
        elif validation_method == "none":
            val_set = {}
        else:
            raise ValueError(f"cfg.OTHERS.VALIDATION value error: {validation_method}")
        cfg_spec.set_ = set_
        if not unset(cfg.SCHEME.DOMAIN_OPTIONS) and str(set_) in cfg.SCHEME.DOMAIN_OPTIONS:
            for key, value in cfg.SCHEME.DOMAIN_OPTIONS[str(set_)].items():
                print(f"Selecting values for domain {key}:{value}")
                cfg_spec[key] = value
        if not unset(cfg.SCHEME.ORDER_OPTIONS) and order in cfg.SCHEME.ORDER_OPTIONS:
            for key, value in cfg.SCHEME.ORDER_OPTIONS[order].items():
                print(f"Selecting values for domain {key}:{value}")
                cfg_spec[key] = value
        cfg_spec.SKIP_CALC |= f_domain
        f_domain = True
        adapter.update_cfg_spec(cfg_spec)
        adapter.train(src_loader, trg_loader, val_set)


def _with_adapt_defaults(cfg, eval_spec):
    """EVALUATION-mode spec piggybacks on the adaptation block for proto params."""
    if cfg.METHOD.ADAPTATION.NAME:
        merged = cfg.METHOD.ADAPTATION[cfg.METHOD.ADAPTATION.NAME].copy()
        merged.update(eval_spec)
        return merged
    return eval_spec


if __name__ == "__main__":
    main()
