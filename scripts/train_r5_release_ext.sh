#!/usr/bin/env bash
# Round-5 flagship continuation (VERDICT r4 item 1): extend the release
# leg of runs/flagship_r4 to close the distribution-quality gap.
#
# The round-4 run stopped at step 267 500 (20.5k short of its planned
# 288k budget) with floored Frechet 6.72 vs the ref-vs-ref floor 2.74
# and DESIGN.md 4h showing the curve still descending. This resumes the
# SAME one-run schedule (seed 1, anchor released at 208k, identical
# data cache) with only the stage-6 stabilization budget extended
# (160k -> 432k, i.e. total 288k -> 560k): the run keeps polishing
# anchor-free until the round-end window stops it with `cli stop`.
#
# Differences from the round-4 command, all resume-safe:
#   - stage-stable-steps[6] 160000 -> 432000 (extends the ladder end
#     only; the restored step 267 500 is inside stage 6 either way)
#   - checkpoint-every 10000 -> 5000 (NEXT.md: tunnel stalls cost less
#     redone work)
#   - max-restarts 8 -> 16 (r4 ate 3 stalls in ~8 h; this run is ~12 h)
set -euo pipefail

cd /root/repo
exec python -m gansynth_tpu.cli supervise \
  --stall-timeout 600 --startup-grace 3600 --max-restarts 16 -- \
  --model-dir /root/repo/runs/flagship_r4 \
  --data /root/repo/runs/flagship_r4/data.tfrecord \
  --synthetic --device-cache \
  --unroll 50 --batch-size 8 --stage-batch-sizes 64,64,32,32,16,8,8 \
  --compute-dtype bfloat16 \
  --pitch-consistency 10 --pitch-consistency-release 208000 \
  --stage-fade-steps 0,8000,8000,8000,10000,10000,12000 \
  --stage-stable-steps 16000,8000,8000,8000,12000,20000,432000 \
  --checkpoint-every 5000 --log-every 500 --sample-every 40000 \
  --seed 1 "$@"
