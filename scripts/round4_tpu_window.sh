#!/usr/bin/env bash
# Round-4 post-training TPU window, one command (the tunnel is
# single-tenant, so everything here must run strictly AFTER the
# flagship training supervisor exits — this script waits for it).
#
#   1. wait for the supervise process (pid file) to exit
#   2. full-scale eval of the flagship run (eval_r4.sh)
#   3. Pallas conv microbench (now incl. the C=64 pixel-pairing shape)
#   4. bench.py full matrix (synthesis xla+pallas, train MFU + HBM b/s)
#
# Outputs land in runs/flagship_r4/ and /tmp/r4_bench_*.log.
set -uo pipefail

PIDFILE=${1:-/tmp/flagship_r4.pid}
RUN_DIR=${2:-/root/repo/runs/flagship_r4}

if [ -f "$PIDFILE" ]; then
  pid=$(cat "$PIDFILE")
  echo "waiting for training supervisor (pid $pid) to exit..."
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
  echo "training exited at $(date)"
fi

cd /root/repo

echo "=== eval (n=488 + attribution) ==="
bash scripts/eval_r4.sh "$RUN_DIR" 2>&1 | tail -5

echo "=== pallas conv microbench ==="
timeout 3600 python scripts/pallas_conv_bench.py \
  > /tmp/r4_pallas_conv_bench.log 2>&1
tail -12 /tmp/r4_pallas_conv_bench.log

echo "=== bench.py full matrix ==="
timeout 3600 python bench.py > /tmp/r4_bench.log 2>&1
tail -2 /tmp/r4_bench.log

echo "=== done $(date) ==="
