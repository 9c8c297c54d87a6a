#!/usr/bin/env python
"""Export an adapted model back to a reference-compatible PyTorch .pth.

    python tools/export_torch.py --state <SNAPSHOT_DIR>/adapt_state \
        --out adapted.pth [--which student|ema|static|dynamic]

Reads the orbax full-state checkpoint written by the adapters (student, EMA,
static, dynamic replicas all live in it), converts the chosen replica's
params + batch stats to the reference's state_dict layout (OIHW convs, BN
weight/bias/running_*) and `torch.save`s it, so a model adapted on TPU can be
evaluated or deployed with the reference PyTorch code (reference
framework/handlers/model_handler.py loads it directly).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WHICH_TO_FIELDS = {
    "student": ("params", "batch_stats"),
    "ema": ("ema_params", "batch_stats"),
    "static": ("static_params", "static_batch_stats"),
    "dynamic": ("dynamic_params", "dynamic_batch_stats"),
}


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--state", required=True, help="orbax state dir (…/adapt_state)")
    parser.add_argument("--out", required=True, help="output .pth path")
    parser.add_argument("--which", default="student", choices=sorted(WHICH_TO_FIELDS))
    args = parser.parse_args()

    import orbax.checkpoint as ocp

    from onda_tpu.models.import_torch import save_torch_checkpoint

    raw = ocp.StandardCheckpointer().restore(os.path.abspath(args.state))
    params_key, stats_key = WHICH_TO_FIELDS[args.which]
    if params_key not in raw:
        raise SystemExit(
            f"{args.state} has no '{params_key}' (fields: {sorted(raw)}) — "
            "advent_state checkpoints only support --which student"
        )
    variables = {"params": raw[params_key], "batch_stats": raw.get(stats_key, {})}
    save_torch_checkpoint(variables, args.out)
    print(f"exported {args.which} replica → {args.out}")


if __name__ == "__main__":
    main()
