"""Summarize per-stage wall-clock and throughput from a run's metrics.jsonl.

Produces the measured per-stage-batch ladder table (VERDICT r2 item 3:
"a measured schedule in DESIGN.md") from the telemetry a training run
already writes: for each progressive stage, steps covered, batch size,
wall-clock seconds (first-to-last telemetry timestamp in the stage),
median steps/s and examples/s.

Usage: python scripts/ladder_summary.py runs/consistency_r3 [--markdown]

Timestamps in metrics.jsonl are host wall-clock taken after a fetched-
scalar sync (train/loop.py), so per-stage deltas are device-true. The
first telemetry row of a stage lands one log interval after the stage's
first step, so per-stage wall slightly undercounts compile + first-chunk
time; the TOTAL row uses the run's outer first/last timestamps.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import statistics


def load(path: pathlib.Path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def summarize(rows):
    stages = {}
    for r in rows:
        stages.setdefault(r["stage"], []).append(r)
    out = []
    for stage in sorted(stages):
        rs = stages[stage]
        steps = rs[-1]["step"] - rs[0]["step"] + (
            rs[1]["step"] - rs[0]["step"] if len(rs) > 1 else 0
        )
        wall = rs[-1]["time"] - rs[0]["time"]
        sps = statistics.median(
            r["steps_per_sec"] for r in rs if "steps_per_sec" in r
        ) if any("steps_per_sec" in r for r in rs) else float("nan")
        out.append(
            {
                "stage": stage,
                "first_step": rs[0]["step"],
                "last_step": rs[-1]["step"],
                "steps": steps,
                "wall_s": wall,
                "median_steps_per_sec": sps,
            }
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument(
        "--batches",
        default=None,
        help="comma list of per-stage batch sizes to add examples/s",
    )
    args = ap.parse_args()
    run = pathlib.Path(args.run_dir)
    rows = load(run / "metrics.jsonl")
    batches = None
    if args.batches:
        batches = [int(b) for b in args.batches.split(",")]
    else:
        cfg_path = run / "train_config.json"
        if cfg_path.exists():
            cfg = json.loads(cfg_path.read_text())
            t = cfg.get("train", cfg)
            batches = t.get("stage_batch_sizes") or None
            if batches is None and t.get("batch_size"):
                batches = [t["batch_size"]] * 7

    summary = summarize(rows)
    total_wall = rows[-1]["time"] - rows[0]["time"]
    if args.markdown:
        print("| stage | steps | batch | median steps/s | examples/s | wall |")
        print("|---|---|---|---|---|---|")
        for s in summary:
            b = batches[s["stage"]] if batches else None
            ex = f"{s['median_steps_per_sec'] * b:.0f}" if b else "—"
            print(
                f"| {s['stage']} | {s['first_step']}–{s['last_step']} "
                f"| {b if b else '—'} | {s['median_steps_per_sec']:.1f} "
                f"| {ex} | {s['wall_s'] / 60:.1f} min |"
            )
        print(f"\nTotal telemetry span: {total_wall / 60:.1f} min")
    else:
        print(json.dumps({"stages": summary, "total_wall_s": total_wall}))


if __name__ == "__main__":
    main()
