"""Pluggable experiment logger.

The reference logs every step straight to wandb (reference train_ouda.py:75-78,
methods/prototypes.py:519) — the sole observability sink (SURVEY.md §5.5). Here
the same key names flow through a `Logger` that writes wandb when available and
always appends JSONL locally (air-gapped boxes, tests), so reference dashboards
remain comparable.
"""

from __future__ import annotations

import json
import os
import time


class Logger:
    def __init__(self, project: str = "OUDA", config: dict | None = None,
                 log_dir: str = ".", use_wandb: bool | None = None, run_name: str | None = None):
        self.step = 0
        self._wandb = None
        # multi-host: every logged scalar is a global (replicated) quantity, so
        # only process 0 writes — N hosts appending identical records to one
        # metrics.jsonl on a shared filesystem would interleave duplicates
        self._primary = True
        import sys

        if "jax" in sys.modules:
            import jax

            self._primary = jax.process_index() == 0
        if not self._primary:
            self.log = lambda metrics: None  # type: ignore[method-assign]
            self.close = lambda: None  # type: ignore[method-assign]
            return
        if use_wandb is None:
            use_wandb = os.environ.get("ONDA_WANDB", "0") == "1"
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, config=config or {})
                if run_name:
                    wandb.run.name = run_name
            except Exception:
                self._wandb = None
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1)
        self._t0 = time.time()

    def log(self, metrics: dict) -> None:
        scalars = {}
        for key, val in metrics.items():
            if hasattr(val, "to_wandb") and getattr(val, "path", None):
                scalars[key] = val.path  # MaskSample: JSONL records the PNG path
                continue
            try:
                scalars[key] = float(val)
            except (TypeError, ValueError):
                continue  # images etc. go to wandb only
        record = {"_step": self.step, "_t": round(time.time() - self._t0, 3), **scalars}
        self._jsonl.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            # sample masks become interactive wandb.Image overlays under the
            # reference's key names (reference utils/logging.py:5-17,
            # adaptation_model.py:196-198); bare PNG paths upload as plain images
            payload = {
                key: (
                    val.to_wandb(self._wandb)
                    if hasattr(val, "to_wandb")
                    else self._wandb.Image(val)
                    if isinstance(val, str) and val.endswith(".png") and os.path.exists(val)
                    else val
                )
                for key, val in metrics.items()
            }
            self._wandb.log(payload, step=self.step)
        self.step += 1

    def close(self):
        self._jsonl.close()
