#!/usr/bin/env bash
# The round-2 headline training run: progressive WGAN-GP to pitch fidelity
# on synthetic NSynth-schema fixtures, single TPU v5e chip.
#
# Schedule sizing comes from measured fused-superstep throughput
# (DESIGN.md 2b): more steps at the cheap low stages, ~135 min total.
# All step counts are multiples of --unroll 50 so no remainder chunks
# compile. Data: 2048 diversified fixture notes (61 pitches, harmonics
# 2-6, decay 0.8-2.2), HBM-resident (--device-cache) so the stream is
# stateless and zero host transfer happens per step.
set -euo pipefail

RUN_DIR=${1:-/root/repo/runs/fidelity_r2}
if [ $# -gt 0 ]; then shift; fi  # remaining args append to the train cmd

mkdir -p "$RUN_DIR"
if [ ! -f "$RUN_DIR/data.tfrecord" ]; then
  python -m gansynth_tpu.cli fixtures \
    --output "$RUN_DIR/data.tfrecord" --num-examples 2048 --seed 7
fi

exec python -m gansynth_tpu.cli train \
  --model-dir "$RUN_DIR" \
  --data "$RUN_DIR/data.tfrecord" --synthetic \
  --device-cache --unroll 50 \
  --batch-size 8 --compute-dtype bfloat16 \
  --stage-fade-steps   0,20000,20000,16000,12000,10000,12000 \
  --stage-stable-steps 40000,20000,20000,16000,12000,14000,36000 \
  --checkpoint-every 10000 --log-every 500 --sample-every 20000 \
  --seed 0 "$@"
