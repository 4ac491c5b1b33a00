#!/usr/bin/env bash
# Round-3 flagship run: from-scratch progressive WGAN-GP with the
# PREVENTIVE pitch-consistency loss (ops/harmonic.py) active from stage 5
# up — the fixed harmonic-template classifier the generator cannot
# watermark. Purpose: confirm the AC-GAN label-swap failure mode
# (DESIGN.md §4d, observed in the r2 run and repaired post-hoc in
# runs/fidelity_r3) never FORMS when the anchor is present from scratch.
#
# Differences vs the r2 recipe (scripts/train_fidelity.sh):
# - --pitch-consistency 10 (the preventive loss; r2 had none),
# - per-stage batches 64,64,32,32,16,8,8 (VERDICT r2 item 3): the low
#   stages ran far below chip capacity at batch 8, so the early ladder
#   sees 4-8x the examples at similar wall-clock,
# - correspondingly compressed low-stage step counts.
#
# Runs under the watchdog supervisor (observed tunnel-hang failure mode).
set -euo pipefail

RUN_DIR=${1:-/root/repo/runs/consistency_r3}
if [ $# -gt 0 ]; then shift; fi  # remaining args append to the train cmd

mkdir -p "$RUN_DIR"
if [ ! -f "$RUN_DIR/data.tfrecord" ]; then
  python -m gansynth_tpu.cli fixtures \
    --output "$RUN_DIR/data.tfrecord" --num-examples 2048 --seed 7
fi

exec python -m gansynth_tpu.cli supervise \
  --stall-timeout 600 --startup-grace 3600 --max-restarts 5 -- \
  --model-dir "$RUN_DIR" \
  --data "$RUN_DIR/data.tfrecord" --synthetic \
  --device-cache --unroll 50 \
  --batch-size 8 --stage-batch-sizes 64,64,32,32,16,8,8 \
  --compute-dtype bfloat16 \
  --pitch-consistency 10 \
  --stage-fade-steps   0,8000,8000,8000,10000,10000,12000 \
  --stage-stable-steps 16000,8000,8000,8000,10000,14000,68000 \
  --checkpoint-every 10000 --log-every 500 --sample-every 20000 \
  --seed 0 "$@"
