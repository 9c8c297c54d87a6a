#!/usr/bin/env python
"""Summarize a run's per-domain mIoU into the paper-style table.

The reference's only observability sink is the wandb dashboard (reference
train_ouda.py:75-78, methods/prototypes.py:519); the OnDA paper's result
tables — mIoU per validation domain at each evaluation point along the storm,
plus the harmonic mean over domains — are assembled by hand from it. Every
run here always writes `metrics.jsonl` locally (utils/logging_.py), so this
tool reconstructs those tables offline:

    python tools/summarize_run.py <run_dir | metrics.jsonl> [--fn model]
                                  [--csv out.csv] [--last]

Rows are evaluation passes (the per-epoch `evaluate_all` cadence); columns are
validation sets, in first-seen order (= SOURCE + DOMAIN_ORDER); the last two
columns are the arithmetic mean and the harmonic mean across domains. The
harmonic mean is the paper's headline aggregate: it punishes collapsing on any
single domain, which is exactly the failure mode online adaptation guards
against.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys


def load_eval_rows(path: str, fn: str) -> tuple[list[str], list[dict]]:
    """Return (ordered set names, rows). Each row: {"_step": int, set: value}.

    fn="" selects the fn-less key form `Val mIoU of {set}` emitted by
    inference-only/validation runs (onda_tpu/methods/segmentation.py, mirroring
    reference methods/segmentation.py:119).
    """
    prefix = "Val mIoU of " if fn == "" else f"Val mIoU {fn} of "
    sets: list[str] = []
    rows: list[dict] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            row = {}
            for key, val in rec.items():
                if key.startswith(prefix):
                    name = key[len(prefix):]
                    row[name] = float(val)
                    if name not in sets:
                        sets.append(name)
            if row:
                row["_step"] = rec.get("_step", len(rows))
                rows.append(row)
    return sets, rows


def available_fns(path: str) -> list[str]:
    fns = []
    with open(path) as f:
        for line in f:
            if '"Val mIoU ' not in line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            for key in rec:
                if key.startswith("Val mIoU of "):
                    # fn-less form `Val mIoU of {set}` (validation-only runs).
                    if "" not in fns:
                        fns.append("")
                elif key.startswith("Val mIoU ") and " of " in key:
                    fn = key[len("Val mIoU "):].split(" of ")[0]
                    if fn and fn not in fns:
                        fns.append(fn)
    return fns


def harmonic_mean(values: list[float]) -> float:
    vals = [v for v in values if not math.isnan(v)]
    if not vals or any(v <= 0 for v in vals):
        return float("nan")
    return len(vals) / sum(1.0 / v for v in vals)


def arithmetic_mean(values: list[float]) -> float:
    vals = [v for v in values if not math.isnan(v)]
    return sum(vals) / len(vals) if vals else float("nan")


def format_table(sets: list[str], rows: list[dict], percent: bool = True) -> str:
    scale = 100.0 if percent else 1.0
    headers = ["eval", "step"] + sets + ["mean", "h-mean"]
    table = []
    for i, row in enumerate(rows):
        vals = [row.get(s, float("nan")) for s in sets]
        cells = [str(i), str(row["_step"])]
        cells += ["-" if math.isnan(v) else f"{v * scale:.2f}" for v in vals]
        cells += [f"{arithmetic_mean(vals) * scale:.2f}", f"{harmonic_mean(vals) * scale:.2f}"]
        table.append(cells)
    widths = [max(len(h), *(len(r[j]) for r in table)) if table else len(h)
              for j, h in enumerate(headers)]
    def fmt(cells):
        return "  ".join(c.rjust(w) for c, w in zip(cells, widths))
    lines = [fmt(headers), fmt(["-" * w for w in widths])]
    lines += [fmt(r) for r in table]
    return "\n".join(lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("run", help="run directory containing metrics.jsonl, or the file itself")
    ap.add_argument("--fn", default=None,
                    help="prediction function to summarize (default: all found, e.g. model, proto)")
    ap.add_argument("--csv", default=None, help="also write the table(s) as CSV")
    ap.add_argument("--last", action="store_true", help="print only the final evaluation row")
    ap.add_argument("--raw", action="store_true", help="print raw [0,1] values instead of percent")
    args = ap.parse_args(argv)

    path = args.run
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    if not os.path.exists(path):
        print(f"no metrics.jsonl at {path}", file=sys.stderr)
        return 1

    fns = [args.fn] if args.fn is not None else available_fns(path)
    if not fns:
        print("no 'Val mIoU {fn} of {set}' keys found — did the run evaluate?", file=sys.stderr)
        return 1

    printed = 0
    for fn in fns:
        label = fn if fn else "(no fn)"
        sets, rows = load_eval_rows(path, fn)
        if not rows:
            print(f"[{label}] no evaluation rows", file=sys.stderr)
            continue
        printed += 1
        shown = rows[-1:] if args.last else rows
        print(f"\n== Val mIoU ({label}) — {'%' if not args.raw else 'raw'} ==")
        print(format_table(sets, shown, percent=not args.raw))
        final = rows[-1]
        vals = [final.get(s, float("nan")) for s in sets]
        scale = 1.0 if args.raw else 100.0
        print(f"final: mean {arithmetic_mean(vals) * scale:.2f}, "
              f"harmonic mean {harmonic_mean(vals) * scale:.2f}")
        if args.csv:
            # One CSV per fn (suffixed when several) with the FULL row history —
            # --last only affects the printed table, never the export.
            out = args.csv
            if len(fns) > 1:
                root, ext = os.path.splitext(out)
                out = f"{root}.{fn or 'nofn'}{ext or '.csv'}"
            lines = [",".join(["fn", "eval", "step"] + sets + ["mean", "h-mean"])]
            for i, row in enumerate(rows):
                v = [row.get(s, float("nan")) for s in sets]
                lines.append(",".join(
                    [label, str(i), str(row["_step"])]
                    + [f"{x * scale:.4f}" for x in v]
                    + [f"{arithmetic_mean(v) * scale:.4f}", f"{harmonic_mean(v) * scale:.4f}"]))
            with open(out, "w") as f:
                f.write("\n".join(lines) + "\n")
            print(f"wrote {out}")
    if not printed:
        print("no evaluation rows found for any fn", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
