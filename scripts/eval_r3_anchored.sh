#!/usr/bin/env bash
# Full-scale eval of the anchored full-budget run (n = 61 pitches x 8
# samples = 488, with per-pitch failure attribution, distribution
# metrics, and LSD vs pitch-matched fixture references). Needs the TPU
# free (single-tenant tunnel); the whole sweep runs as batch-61 device
# programs, one per sample round.
set -euo pipefail

RUN_DIR=${1:-/root/repo/runs/anchored_full_r3}

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
