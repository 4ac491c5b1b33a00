#!/usr/bin/env bash
# Outer retry loop around scripts/train_r3_anchored_full.sh for TPU-pool
# outages: the watchdog supervisor treats a failed backend *claim* as a
# child crash and burns its restart budget on it (~20-25 min per failed
# claim attempt), so a pool outage longer than budget x cycle kills the
# launch. This wrapper relaunches the whole supervisor until training
# actually completes (supervisor exit 0); everything resumes from the
# latest checkpoint, so relaunches lose nothing.
set -u
RUN_DIR=${1:-/root/repo/runs/anchored_full_r3}
while true; do
  bash /root/repo/scripts/train_r3_anchored_full.sh "$RUN_DIR" && break
  echo "persist: supervisor gave up (rc=$?); retrying in 120s" >&2
  sleep 120
done
echo "persist: training completed"
