"""Host-side tool tests (no device work)."""

import json
import math
import subprocess
import sys

ROOT = __file__.rsplit("/tests/", 1)[0]


def _write_metrics(tmp_path, rows):
    path = tmp_path / "metrics.jsonl"
    with open(path, "w") as f:
        for rec in rows:
            f.write(json.dumps(rec) + "\n")
    return path


def test_summarize_run_table_and_hmean(tmp_path):
    sys.path.insert(0, f"{ROOT}/tools")
    try:
        import summarize_run
    finally:
        sys.path.pop(0)

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

    # CLI surface: run dir (not file) + CSV export
    out_csv = tmp_path / "table.csv"
    proc = subprocess.run(
        [sys.executable, f"{ROOT}/tools/summarize_run.py", str(tmp_path),
         "--csv", str(out_csv)],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    assert "harmonic mean" in proc.stdout
    csv = out_csv.read_text().splitlines()
    assert csv[0].startswith("fn,eval,step,clear,50mm")
    assert any(line.startswith("model,1,9,") for line in csv)


def test_summarize_run_no_eval_rows(tmp_path):
    path = _write_metrics(tmp_path, [{"_step": 0, "Total target loss": 1.0}])
    proc = subprocess.run(
        [sys.executable, f"{ROOT}/tools/summarize_run.py", str(path)],
        capture_output=True, text=True)
    assert proc.returncode == 1
    assert "no 'Val mIoU" in proc.stderr
