"""Tests for scripts/ladder_summary.py (per-stage telemetry summarizer).

Pure-stdlib script (no JAX): build a synthetic metrics.jsonl with known
stage spans and check the per-stage aggregation that feeds the measured
ladder table in DESIGN.md §4e.
"""

import importlib.util
import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
_spec = importlib.util.spec_from_file_location(
    "ladder_summary", ROOT / "scripts" / "ladder_summary.py"
)
ladder_summary = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ladder_summary)


def _rows():
    rows = []
    t = 1000.0
    step = 0
    # stage 0: 4 chunks of 500 steps at 50/s; stage 1: 3 chunks at 10/s
    for stage, n_chunks, sps in [(0, 4, 50.0), (1, 3, 10.0)]:
        for _ in range(n_chunks):
            step += 500
            t += 500 / sps
            rows.append(
                {"step": step, "time": t, "stage": stage,
                 "steps_per_sec": sps, "d_loss": -1.0}
            )
    return rows


def test_summarize_per_stage_spans():
    out = ladder_summary.summarize(_rows())
    assert [s["stage"] for s in out] == [0, 1]
    s0, s1 = out
    assert s0["first_step"] == 500 and s0["last_step"] == 2000
    assert s1["first_step"] == 2500 and s1["last_step"] == 3500
    # wall = last-first telemetry timestamp within the stage
    assert abs(s0["wall_s"] - 1500 / 50.0) < 1e-6
    assert abs(s1["wall_s"] - 1000 / 10.0) < 1e-6
    assert s0["median_steps_per_sec"] == 50.0
    assert s1["median_steps_per_sec"] == 10.0


def test_cli_markdown_and_json(tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    with open(run / "metrics.jsonl", "w") as f:
        for r in _rows():
            f.write(json.dumps(r) + "\n")
    (run / "train_config.json").write_text(
        json.dumps({"train": {"stage_batch_sizes": [64, 32], "batch_size": 8}})
    )
    script = str(ROOT / "scripts" / "ladder_summary.py")
    md = subprocess.run(
        [sys.executable, script, str(run), "--markdown"],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "| 0 | 500–2000 | 64 | 50.0 |" in md
    assert "| 1 | 2500–3500 | 32 | 10.0 |" in md
    js = subprocess.run(
        [sys.executable, script, str(run)],
        capture_output=True, text=True, check=True,
    ).stdout
    parsed = json.loads(js)
    assert len(parsed["stages"]) == 2
    assert parsed["total_wall_s"] > 0


def test_real_run_artifact_parses():
    # The committed consistency-run telemetry must stay summarizable.
    run = ROOT / "runs" / "consistency_r3"
    rows = ladder_summary.load(run / "metrics.jsonl")
    out = ladder_summary.summarize(rows)
    assert [s["stage"] for s in out] == list(range(7))
    assert out[-1]["last_step"] == 88000
