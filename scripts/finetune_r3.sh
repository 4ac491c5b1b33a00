#!/usr/bin/env bash
# Round-3 repair finetune: unwind the AC-GAN label-swap equilibrium
# (DESIGN.md §4d) by anchoring D's pitch head on REAL audio only.
#
# Phase 1 (this script): resume the committed 330k checkpoint with
# d_pitch_ce_on_fake=false for 20k steps. The fake-batch CE is what lets
# D maintain the generator's non-auditory watermark channel; with it
# gone, the watermark decays and G's pitch CE (still on) pulls the
# fundamental to the conditioned pitch.
#
# Phase 2 (scripts/reinit_pitch_head.py, only if phase 1 stalls):
# reinitialize D's pitch-head params in the checkpoint so the head must
# relearn from real-CE alone — it then reads TRUE pitch and G's CE
# gradient spikes exactly at the swapped labels.
#
# Run under the watchdog (the r2 hang at step 333.5k is this machine's
# observed failure mode).
set -euo pipefail

RUN_DIR=${1:-/root/repo/runs/fidelity_r3}
SRC_RUN=${2:-/root/repo/runs/fidelity_r2}
STEPS=${3:-20000}
if [ ! -d "$RUN_DIR/checkpoints" ]; then
  mkdir -p "$RUN_DIR/checkpoints"
  cp -r "$SRC_RUN"/checkpoints/"$(ls "$SRC_RUN/checkpoints" | sort -n | tail -1)" \
    "$RUN_DIR/checkpoints/"
fi
printf '{"train": {"d_pitch_ce_on_fake": false}}\n' > "$RUN_DIR/finetune_override.json"

exec python -m gansynth_tpu.cli supervise \
  --stall-timeout 600 --startup-grace 3600 --max-restarts 3 -- \
  --model-dir "$RUN_DIR" \
  --data "$SRC_RUN/data.tfrecord" --synthetic \
  --device-cache --unroll 50 \
  --batch-size 8 --compute-dtype bfloat16 \
  --stage-fade-steps   0,20000,20000,16000,12000,10000,12000 \
  --stage-stable-steps 40000,20000,20000,16000,12000,14000,132000 \
  --checkpoint-every 5000 --log-every 500 \
  --seed 0 --config "$RUN_DIR/finetune_override.json" \
  --num-steps "$STEPS"
