#!/usr/bin/env python
"""Side-by-side comparison of trained runs from their committed artifacts
(eval_full.json + metrics.jsonl) — produces the README/DESIGN markdown
table for e.g. flagship-with-repair vs anchored-from-scratch.

Usage: python scripts/compare_runs.py runs/fidelity_r3 runs/anchored_full_r3
(any number of run dirs; rows are metrics, columns are runs).
No TPU, no jax — reads artifacts only.
"""

import json
import os
import sys


def load(run_dir):
    out = {"name": os.path.basename(run_dir.rstrip("/"))}
    with open(os.path.join(run_dir, "eval_full.json")) as f:
        ev = json.load(f)
    att = ev.get("attribution", {})
    ci = att.get("ci95_either")
    out["n"] = ev.get("num_samples")
    out["acc_either"] = ev.get("pitch_accuracy_either")
    out["ci"] = ci
    out["acc_acf"] = ev.get("pitch_accuracy_acf")
    out["acc_hps"] = ev.get("pitch_accuracy")
    out["med_err"] = ev.get("pitch_median_error_acf")
    out["mae"] = ev.get("pitch_mae_either")
    modes = att.get("both_failure_modes", {})
    out["both_fail"] = sum(modes.values()) if modes else None
    out["octave_down"] = modes.get("octave_down")
    out["diversity"] = ev.get("diversity_ratio_60db",
                              ev.get("diversity_ratio"))
    out["frechet"] = ev.get("frechet_mel_60db", ev.get("frechet_mel"))
    out["frechet_floor"] = ev.get("frechet_mel_60db_ref_floor")
    out["lsd60"] = ev.get("log_spectral_distance_60db")
    # worst single pitch: max failures among per-pitch rows
    per_pitch = att.get("per_pitch", {})
    worst = None
    for pitch, row in per_pitch.items():
        fails = row.get("n", 0) - row.get("ok_either", 0)
        if worst is None or fails > worst[1]:
            worst = (pitch, fails, row.get("n", 0))
    out["worst_pitch"] = worst
    metrics_path = os.path.join(run_dir, "metrics.jsonl")
    steps = wall = None
    if os.path.exists(metrics_path):
        first = last = None
        with open(metrics_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if first is None:
                    first = rec
                last = rec
        if last:
            steps = last.get("step")
            if first and "time" in first and "time" in last:
                wall = (last["time"] - first["time"]) / 60.0
    out["steps"] = steps
    out["wall_min"] = wall
    return out


def fmt(v, pct=False, digits=3):
    if v is None:
        return "—"
    if pct:
        return f"{100 * v:.1f}%"
    if isinstance(v, float):
        return f"{v:.{digits}g}"
    return str(v)


def main(argv):
    runs = [load(d) for d in argv]
    rows = [
        ("eval notes (n)", [fmt(r["n"]) for r in runs]),
        ("pitch accuracy, either detector",
         [fmt(r["acc_either"], pct=True)
          + (f" [{100*r['ci'][0]:.1f}, {100*r['ci'][1]:.1f}]"
             if r["ci"] else "")
          for r in runs]),
        ("— autocorrelation detector",
         [fmt(r["acc_acf"], pct=True) for r in runs]),
        ("— harmonic-sum detector",
         [fmt(r["acc_hps"], pct=True) for r in runs]),
        ("both-detector failures", [fmt(r["both_fail"]) for r in runs]),
        ("— octave-down (swap signature)",
         [fmt(r["octave_down"]) for r in runs]),
        ("worst single pitch (fails/n)",
         [f"{w[0]}: {w[1]}/{w[2]}" if (w := r["worst_pitch"]) else "—"
          for r in runs]),
        ("median pitch error (ACF, st)",
         [fmt(r["med_err"]) for r in runs]),
        ("pitch MAE (best-of-detectors, st)", [fmt(r["mae"]) for r in runs]),
        ("intra-pitch diversity ratio (floored)",
         [fmt(r["diversity"]) for r in runs]),
        ("Fréchet log-mel (floored / ref-vs-ref floor)",
         [f"{fmt(r['frechet'])} / {fmt(r['frechet_floor'])}" for r in runs]),
        ("LSD vs pitch-matched refs (floored)",
         [fmt(r["lsd60"]) for r in runs]),
        ("train steps (incl. restarts)", [fmt(r["steps"]) for r in runs]),
        ("train wall clock (min)",
         [fmt(r["wall_min"], digits=4) for r in runs]),
    ]
    header = "| metric | " + " | ".join(r["name"] for r in runs) + " |"
    print(header)
    print("|" + "---|" * (len(runs) + 1))
    for label, cells in rows:
        print(f"| {label} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main(sys.argv[1:])
