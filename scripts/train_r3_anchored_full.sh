#!/usr/bin/env bash
# Round-3 capstone: the FULL-BUDGET from-scratch run with the preventive
# pitch-consistency anchor (ops/harmonic.py) — the experiment NEXT.md
# names as the open extension of runs/consistency_r3: does the anchored
# recipe reach the repaired flagship's accuracy (>=99.8% at n=488)
# WITHOUT any post-hoc repair phase?
#
# Recipe = runs/consistency_r3 (per-stage batch ladder 64,64,32,32,16,8,8,
# --pitch-consistency 10 active from stage 5 up, watchdog supervisor)
# with the stage-6 span scaled to the flagship's: 132k steps at 128x1024
# (12k fade + 120k stable) vs the consistency run's 30k. Stage 5 gets a
# longer stable span too (20k vs 14k) since that is where the anchor
# switches on. ~248k total steps; ~5.5h device time at the measured
# ladder (DESIGN.md §4e table).
#
# Seed 1 (consistency_r3 and fidelity_r2 both used seed 0): prevention
# should hold under a fresh draw, not just replay one lucky trajectory.
set -euo pipefail

RUN_DIR=${1:-/root/repo/runs/anchored_full_r3}
if [ $# -gt 0 ]; then shift; fi  # remaining args append to the train cmd

mkdir -p "$RUN_DIR"
if [ ! -f "$RUN_DIR/data.tfrecord" ]; then
  python -m gansynth_tpu.cli fixtures \
    --output "$RUN_DIR/data.tfrecord" --num-examples 2048 --seed 7
fi

exec python -m gansynth_tpu.cli supervise \
  --stall-timeout 600 --startup-grace 3600 --max-restarts 8 -- \
  --model-dir "$RUN_DIR" \
  --data "$RUN_DIR/data.tfrecord" --synthetic \
  --device-cache --unroll 50 \
  --batch-size 8 --stage-batch-sizes 64,64,32,32,16,8,8 \
  --compute-dtype bfloat16 \
  --pitch-consistency 10 \
  --stage-fade-steps   0,8000,8000,8000,10000,10000,12000 \
  --stage-stable-steps 16000,8000,8000,8000,12000,20000,120000 \
  --checkpoint-every 10000 --log-every 500 --sample-every 40000 \
  --seed 1 "$@"
