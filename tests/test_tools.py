"""Host-side tool tests (no device work)."""

import importlib.util
import json
import math
import subprocess
import sys

ROOT = __file__.rsplit("/tests/", 1)[0]


def _load_summarize_run():
    # Load by path (no sys.path mutation — ADVICE r1).
    spec = importlib.util.spec_from_file_location(
        "summarize_run", f"{ROOT}/tools/summarize_run.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_metrics(tmp_path, rows):
    path = tmp_path / "metrics.jsonl"
    with open(path, "w") as f:
        for rec in rows:
            f.write(json.dumps(rec) + "\n")
    return path


def test_summarize_run_table_and_hmean(tmp_path):
    summarize_run = _load_summarize_run()

    rows = [
        {"_step": 0, "Total target loss": 1.0},  # step log — no eval keys, skipped
        {"_step": 1, "Val mIoU model of clear": 0.60, "Val mIoU model of 50mm": 0.30,
         "Val mIoU proto of clear": 0.61},
        {"_step": 9, "Val mIoU model of clear": 0.58, "Val mIoU model of 50mm": 0.40},
    ]
    path = _write_metrics(tmp_path, rows)

    assert summarize_run.available_fns(str(path)) == ["model", "proto"]
    sets, eval_rows = summarize_run.load_eval_rows(str(path), "model")
    assert sets == ["clear", "50mm"]  # first-seen order = SOURCE + DOMAIN_ORDER
    assert len(eval_rows) == 2 and eval_rows[1]["50mm"] == 0.40

    # harmonic mean: 2 / (1/0.58 + 1/0.40) exactly
    hm = summarize_run.harmonic_mean([0.58, 0.40])
    assert abs(hm - 2 / (1 / 0.58 + 1 / 0.40)) < 1e-12
    assert math.isnan(summarize_run.harmonic_mean([0.5, 0.0]))  # collapse guard
    assert math.isnan(summarize_run.harmonic_mean([float("nan")]))

    table = summarize_run.format_table(sets, eval_rows)
    assert "h-mean" in table and "58.00" in table and "40.00" in table

    # CLI surface: run dir (not file) + CSV export — one CSV per fn when several
    out_csv = tmp_path / "table.csv"
    proc = subprocess.run(
        [sys.executable, f"{ROOT}/tools/summarize_run.py", str(tmp_path),
         "--csv", str(out_csv)],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    assert "harmonic mean" in proc.stdout
    csv = (tmp_path / "table.model.csv").read_text().splitlines()
    assert csv[0].startswith("fn,eval,step,clear,50mm")
    assert any(line.startswith("model,1,9,") for line in csv)
    assert (tmp_path / "table.proto.csv").exists()

    # Single fn selected → un-suffixed CSV, and --last does NOT truncate the CSV
    proc = subprocess.run(
        [sys.executable, f"{ROOT}/tools/summarize_run.py", str(tmp_path),
         "--fn", "model", "--csv", str(out_csv), "--last"],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    csv = out_csv.read_text().splitlines()
    assert len(csv) == 3  # header + both eval rows despite --last
    assert proc.stdout.count("model,") == 0  # table printed, not csv rows


def test_summarize_run_fnless_validation_keys(tmp_path):
    """Inference-only runs log `Val mIoU of {set}` (no fn) — ADVICE r1 medium."""
    summarize_run = _load_summarize_run()
    rows = [
        {"_step": 0, "Val mIoU of clear": 0.645, "Val mIoU of 50mm": 0.41},
    ]
    path = _write_metrics(tmp_path, rows)
    assert summarize_run.available_fns(str(path)) == [""]
    sets, eval_rows = summarize_run.load_eval_rows(str(path), "")
    assert sets == ["clear", "50mm"]
    assert eval_rows[0]["clear"] == 0.645

    proc = subprocess.run(
        [sys.executable, f"{ROOT}/tools/summarize_run.py", str(path)],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    assert "(no fn)" in proc.stdout and "64.50" in proc.stdout


def test_summarize_run_no_eval_rows(tmp_path):
    path = _write_metrics(tmp_path, [{"_step": 0, "Total target loss": 1.0}])
    proc = subprocess.run(
        [sys.executable, f"{ROOT}/tools/summarize_run.py", str(path)],
        capture_output=True, text=True)
    assert proc.returncode == 1
    assert "no 'Val mIoU" in proc.stderr


def test_summarize_run_bad_fn_returns_nonzero(tmp_path):
    """A typo'd --fn must exit 1, not print nothing and exit 0 (ADVICE r1)."""
    path = _write_metrics(
        tmp_path, [{"_step": 1, "Val mIoU model of clear": 0.6}])
    proc = subprocess.run(
        [sys.executable, f"{ROOT}/tools/summarize_run.py", str(path),
         "--fn", "tpyo"],
        capture_output=True, text=True)
    assert proc.returncode == 1
    assert "no evaluation rows" in proc.stderr
