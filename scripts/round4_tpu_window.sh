#!/usr/bin/env bash
# Round-4 post-training TPU window, one command (the tunnel is
# single-tenant, so everything here must run strictly AFTER the
# flagship training supervisor exits — this script waits for it).
#
# Ordered by importance so a short window still captures the round's
# evidence (each leg has its own timeout; later legs run regardless):
#   1. wait for the supervise process (pid file) to exit
#   2. full-scale eval of the flagship run (eval_r4.sh) -> eval_full.json
#   3. COMMIT the run artifacts immediately (ema.npz + eval_full.json +
#      metrics + config) — round 3 lost its best checkpoint by leaving
#      it on local disk only
#   4. bench.py full matrix (synthesis xla+pallas, train MFU + HBM b/s)
#   5. Pallas conv microbench (incl. the C=64 pixel-pairing shape)
#   6. commit the bench logs
#
# Outputs land in runs/flagship_r4/ and /tmp/r4_*.log.
set -uo pipefail

PIDFILE=${1:-/tmp/flagship_r4.pid}
RUN_DIR=${2:-/root/repo/runs/flagship_r4}

# The tunnel is single-tenant: starting eval/bench interpreters while
# the flagship run is live can break its backend registration. A
# missing pidfile therefore HARD-FAILS (pass the literal `none` to skip
# the wait only when you know no TPU job is running).
if [ "$PIDFILE" = "none" ]; then
  echo "pidfile wait skipped by request (PIDFILE=none)"
elif [ -f "$PIDFILE" ]; then
  pid=$(cat "$PIDFILE")
  echo "waiting for training supervisor (pid $pid) to exit..."
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
  echo "training exited at $(date)"
else
  echo "ERROR: pidfile $PIDFILE missing — refusing to contend with a" >&2
  echo "possibly-live TPU run (pass PIDFILE=none to skip the wait)" >&2
  exit 2
fi

cd /root/repo

echo "=== eval (n=488 + attribution) $(date) ==="
timeout 3000 bash scripts/eval_r4.sh "$RUN_DIR" \
  > /tmp/r4_eval.log 2>&1
tail -8 /tmp/r4_eval.log

echo "=== committing flagship artifacts $(date) ==="
# One guarded add per file: `git add existing missing` stages NOTHING
# (all-or-nothing), which is exactly how round 3 lost its checkpoint.
for f in ema.npz metrics.jsonl train_config.json eval_full.json; do
  [ -f "$RUN_DIR/$f" ] && git add "$RUN_DIR/$f" \
    || echo "(skip missing $RUN_DIR/$f)"
done
git commit -m "Flagship r4 anchor->release run: EMA weights, metrics, full eval" \
  || echo "(nothing to commit)"

echo "=== bench.py full matrix $(date) ==="
timeout 2400 python bench.py > /tmp/r4_bench.log 2>&1
tail -2 /tmp/r4_bench.log

echo "=== pallas conv microbench $(date) ==="
timeout 2400 python scripts/pallas_conv_bench.py --repeats 3 \
  > /tmp/r4_pallas_conv_bench.log 2>&1
tail -14 /tmp/r4_pallas_conv_bench.log

echo "=== committing bench logs $(date) ==="
mkdir -p "$RUN_DIR/bench"
cp -f /tmp/r4_bench.log /tmp/r4_pallas_conv_bench.log /tmp/r4_eval.log \
      "$RUN_DIR/bench/" 2>/dev/null || true
git add "$RUN_DIR/bench" && git commit -m \
  "Round-4 TPU window results: bench matrix + conv microbench + eval log" \
  || echo "(nothing to commit)"

echo "=== done $(date) ==="
