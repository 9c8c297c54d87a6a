"""EVALUATION mode: inference-only runs from the newest snapshot.

Reference: the `evaluation` subclass auto-loads the newest .pth in SNAPSHOT_DIR by
mtime (reference methods/adaptation_model.py:252-265); with PREDICTION_SAVE set it
dumps raw per-batch logits per target domain while logging mean confidence and
progress (reference :234-249, train_ouda.py:159-182)."""

from __future__ import annotations

import os
from pathlib import Path

import jax
import numpy as np

from .proto_online import ProtoOnlineAdapter


class EvaluationRunner(ProtoOnlineAdapter):
    def __init__(self, model, variables, cfg, cfg_spec, num_classes, logger=None):
        super().__init__(model, variables, cfg, cfg_spec, num_classes, logger)
        dirpath = cfg.OTHERS.SNAPSHOT_DIR
        if dirpath != "NONE" and os.path.isdir(dirpath):
            # newest first; fall back past partial/unreadable snapshots (a
            # crashed writer can leave an empty orbax dir behind)
            for cand in self._checkpoints_by_mtime(dirpath)[::-1]:
                try:
                    self.load_model(str(cand))
                except Exception as exc:
                    print(f"load skip: {cand.name} (unloadable: {type(exc).__name__})")
                    continue
                print(f"Model {cand} is being loaded")
                break

    # orbax prefixes this (proto-based) runner's load_model can restore
    # (advent_state via the student-subtree lift in load_model)
    COMPATIBLE_PREFIXES = ("adapt_state", "model_train", "advent_state")

    @classmethod
    def _checkpoints_by_mtime(cls, dirpath: str, prefixes: tuple = None,
                              allow_pth: bool = True) -> list:
        """Compatible checkpoints (.pth files / orbax state dirs), sorted
        oldest→newest by mtime. `allow_pth=False` restricts to orbax state
        dirs (exact-resume discovery: .pth is a student-only checkpoint)."""
        prefixes = cls.COMPATIBLE_PREFIXES if prefixes is None else prefixes
        return sorted(
            (
                p for p in Path(dirpath).iterdir()
                # orbax writes to <name>.orbax-checkpoint-tmp-* and renames on
                # finalize; an in-progress/abandoned tmp dir must never be
                # picked (it can restore stale or partial data "successfully")
                if "orbax-checkpoint-tmp" not in p.name
                and ((allow_pth and p.suffix == ".pth")
                     or (p.is_dir() and p.name.startswith(prefixes)))
            ),
            key=lambda p: p.stat().st_mtime,
        )

    @classmethod
    def _newest_checkpoint(cls, dirpath: str, prefixes: tuple = None,
                           allow_pth: bool = True):
        """Newest compatible checkpoint by mtime (reference :255-259)."""
        candidates = cls._checkpoints_by_mtime(dirpath, prefixes, allow_pth)
        return str(candidates[-1]) if candidates else None

    def sweep_checkpoints(self, validation_loaders, wait_seconds: float = 0.0) -> dict:
        """Evaluate EVERY checkpoint in SNAPSHOT_DIR (mtime order) and report
        the best — the reference's legacy snapshot sweeper
        (eval_single/eval_best, reference eval_UDA.py:77-198). With
        `wait_seconds > 0` it keeps polling for new checkpoints like the
        reference's eval_best 5-second loop (reference eval_UDA.py:148-151)
        until none appear for that long.
        """
        import time

        seen: set[str] = set()
        best = {"checkpoint": None, "miou": float("-inf")}
        dirpath = str(self.cfg.OTHERS.SNAPSHOT_DIR)
        deadline = time.monotonic() + wait_seconds
        while True:
            candidates = [
                p for p in self._checkpoints_by_mtime(dirpath) if str(p) not in seen
            ] if os.path.isdir(dirpath) else []
            for ckpt in candidates:
                seen.add(str(ckpt))
                try:
                    self.load_model(str(ckpt))
                except Exception as exc:
                    # the polling sweeper can race a concurrent writer (the
                    # reference's eval_best has the same race, eval_UDA.py:148);
                    # a partial/foreign snapshot is skipped, not fatal
                    print(f"sweep skip: {ckpt.name} (unloadable: {type(exc).__name__})")
                    continue
                result = self.evaluate_all(validation_loaders)
                mious = [v for k, v in result.items() if k.startswith("Val mIoU model")]
                miou = float(np.mean(mious)) if mious else float("nan")
                self._log({**result, "Swept checkpoint": ckpt.name, "Swept mIoU": miou})
                print(f"sweep: {ckpt.name} mIoU {miou:.4f}")
                if miou == miou and miou > best["miou"]:
                    best = {"checkpoint": ckpt.name, "miou": miou}
                deadline = time.monotonic() + wait_seconds
            if candidates or time.monotonic() < deadline:
                time.sleep(min(5.0, wait_seconds) if wait_seconds else 0.0)
                if wait_seconds:
                    continue
            break
        if best["checkpoint"] is not None:
            self._log({"Best checkpoint": best["checkpoint"], "Best mIoU": best["miou"]})
            print(f"best: {best['checkpoint']} mIoU {best['miou']:.4f}")
        return best

    def run_predictions(self, trg_loader) -> None:
        """Dump per-batch target logits + log confidence (reference :234-249)."""
        base = os.path.join(
            str(self.cfg_spec.PREDICTION_SAVE), "_".join(str(self.cfg_spec.set_))
        )
        os.makedirs(base, exist_ok=True)

        @jax.jit
        def forward(state, images):
            _, main = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats}, images, train=False
            )
            out = main["out"] if isinstance(main, dict) else main
            conf = jax.nn.softmax(out, axis=-1).max(axis=-1).mean()
            return out, conf

        from .proto_online import dump_logits_batch

        n = len(trg_loader) if hasattr(trg_loader, "__len__") else 0
        from ..parallel import fetch_global, is_primary

        for i, batch in enumerate(trg_loader):
            out, conf = forward(self.state, self._place(batch["image"]))
            # multi-host: assemble the full global batch (collective — every
            # host participates), then one writer dumps it
            out = fetch_global(out)
            if is_primary():
                dump_logits_batch(base, i, out)
            self._log({
                "Prediction confidence": float(conf),
                "Progress": (i * 100.0 / n) if n else float(i),
            })
