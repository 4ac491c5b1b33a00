#!/usr/bin/env bash
# The production recipe, one command (DESIGN.md §4g final form):
# train from scratch with the harmonic pitch-consistency anchor active
# through stage formation, then RELEASE it inside the same run — at the
# release step the loss program is rebuilt with the anchor at 0 and
# d_pitch_ce_on_fake=false (the AC-GAN watermark channel stays closed
# the repair-proven way), so distribution quality recovers while the
# locked-in pitch structure persists.
#
# Measured basis (round 3): the anchored run reaches 100.0%
# either-detector pitch accuracy (n=488, zero failures) but floored
# Fréchet 92.5; releasing the anchor for a 40k polish leg moved Fréchet
# 92.5 -> 11.4 (8x) with pitch still 488/488. This script is that whole
# lineage as a single supervised run: the 248k anchored schedule
# (scripts/train_r3_anchored_full.sh) plus a 40k release leg, with the
# release step = the anchored schedule's end (248k).
#
# Runs under the watchdog supervisor (`cli supervise`) — the observed
# failure mode of this machine's TPU tunnel is a wedged dispatch, which
# the supervisor detects via metrics staleness and auto-resumes; the
# release phase is a pure function of the global step, so a restart on
# either side of the boundary lands in the right phase.
set -euo pipefail

RUN_DIR=${1:-/root/repo/runs/anchor_release_onerun}
case "$RUN_DIR" in
  -*)
    # A first arg like `--seed 2` would silently become the run
    # directory; require an explicit RUN_DIR before any train flags.
    echo "usage: $0 [RUN_DIR] [extra train flags...]" >&2
    echo "first argument must be the run directory, not a flag" >&2
    exit 2
    ;;
esac
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
  --pitch-consistency-release 248000 \
  --stage-fade-steps   0,8000,8000,8000,10000,10000,12000 \
  --stage-stable-steps 16000,8000,8000,8000,12000,20000,160000 \
  --checkpoint-every 10000 --log-every 500 --sample-every 40000 \
  --seed 1 "$@"
