#!/usr/bin/env bash
# Round-3 "scaffolding release" leg: the anchored full-budget run
# (runs/anchored_full_r3, DESIGN.md §4f) reaches 100.0% pitch accuracy
# but its floored intra-pitch diversity is 0.50 vs the unanchored
# flagship's ~5 and its floored Fréchet 92.5 vs 4.47 — the harmonic
# anchor that pins the fundamental plausibly also squeezes timbre
# variety toward the template. Hypothesis: the anchor is scaffolding —
# needed while pitch structure FORMS, removable once it has locked in.
#
# This leg resumes the 248k-step anchored checkpoint with the anchor
# OFF and the watermark channel closed the repair-proven way
# (d_pitch_ce_on_fake=false, DESIGN.md §4d) so no AC-GAN swap can form
# in its place, then measures whether distribution quality recovers
# while pitch stays perfect.
set -euo pipefail

RUN_DIR=${1:-/root/repo/runs/anchored_release_r3}
SRC_RUN=${2:-/root/repo/runs/anchored_full_r3}
STEPS=${3:-40000}
if [ ! -d "$RUN_DIR/checkpoints" ]; then
  mkdir -p "$RUN_DIR/checkpoints"
  cp -r "$SRC_RUN"/checkpoints/"$(ls "$SRC_RUN/checkpoints" | sort -n | tail -1)" \
    "$RUN_DIR/checkpoints/"
fi
printf '{"train": {"pitch_consistency_weight": 0.0, "d_pitch_ce_on_fake": false}}\n' \
  > "$RUN_DIR/release_override.json"

exec python -m gansynth_tpu.cli supervise \
  --stall-timeout 600 --startup-grace 3600 --max-restarts 4 -- \
  --model-dir "$RUN_DIR" \
  --data "$SRC_RUN/data.tfrecord" --synthetic \
  --device-cache --unroll 50 \
  --batch-size 8 --stage-batch-sizes 64,64,32,32,16,8,8 \
  --compute-dtype bfloat16 \
  --stage-fade-steps   0,8000,8000,8000,10000,10000,12000 \
  --stage-stable-steps 16000,8000,8000,8000,12000,20000,120000 \
  --checkpoint-every 10000 --log-every 500 \
  --seed 1 --config "$RUN_DIR/release_override.json" \
  --num-steps "$STEPS"
