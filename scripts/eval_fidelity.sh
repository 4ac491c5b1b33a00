#!/usr/bin/env bash
# Evaluate the fidelity run's EMA generator (pitch metrics + LSD) and
# write sample wavs. Run AFTER scripts/train_fidelity.sh completes; needs
# the TPU free (single-tenant tunnel).
set -euo pipefail

RUN_DIR=${1:-/root/repo/runs/fidelity_r2}

python -m gansynth_tpu.cli evaluate \
  --model-dir "$RUN_DIR" \
  --batch-size 8 --compute-dtype bfloat16 \
  --pitches $(seq 24 4 84) --samples-per-pitch 4 \
  --lsd-data "$RUN_DIR/data.tfrecord" \
  | tail -1 | tee "$RUN_DIR/eval.json"

python -m gansynth_tpu.cli generate \
  --model-dir "$RUN_DIR" --output-dir "$RUN_DIR/final_samples" \
  --pitches 24 36 48 60 72 84 --num-samples 2 \
  --batch-size 8 --compute-dtype bfloat16
