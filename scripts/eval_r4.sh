#!/usr/bin/env bash
# Full-scale eval of the round-4 flagship anchor->release run (n = 61
# pitches x 8 samples = 488, per-pitch failure attribution, distribution
# metrics, LSD vs pitch-matched fixture references). Needs the TPU free
# (single-tenant tunnel); the whole sweep runs as batch-61 device
# programs, one per sample round.
#
# Round-4 target (VERDICT r3 item 1): frechet_mel_60db <= ~4 (floor
# 2.74), diversity_ratio_60db >= 0.8, pitch >= 485/488 per detector —
# reported per-detector (the evaluate CLI now prints HPS/ACF/either on
# one line).
set -euo pipefail

RUN_DIR=${1:-/root/repo/runs/flagship_r4}

python -m gansynth_tpu.cli evaluate \
  --model-dir "$RUN_DIR" \
  --compute-dtype bfloat16 \
  --pitches $(seq 24 84) --samples-per-pitch 8 \
  --attribution --seed 0 \
  --lsd-data "$RUN_DIR/data.tfrecord" \
  --output "$RUN_DIR/eval_full.json"

python -m gansynth_tpu.cli generate \
  --model-dir "$RUN_DIR" --output-dir "$RUN_DIR/final_samples" \
  --pitches 24 36 48 60 72 84 --num-samples 2 \
  --compute-dtype bfloat16
