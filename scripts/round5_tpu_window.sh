#!/usr/bin/env bash
# Round-5 post-training TPU window, one command (the tunnel is
# single-tenant, so everything here runs strictly AFTER the flagship
# training supervisor exits — this script stops it gracefully and
# waits).
#
# Ordered by importance so a short window still captures the round's
# evidence (each leg has its own timeout; later legs run regardless):
#   1. graceful `cli stop` of the release-leg run + wait for the
#      supervisor (pid file) to exit
#   2. full-scale eval (n=488, three detectors + per-note receipts,
#      distribution metrics) -> eval_full.json
#   3. COMMIT the run artifacts immediately (round-3 lesson: never
#      leave the best checkpoint on local disk only)
#   4. bench.py full matrix (train MFU/HBM + batch sweep + synthesis
#      kernels + host ingest)
#   5. fused D-block microbench (fwd / grad / full-superstep A/B) —
#      VERDICT item 2's accept-or-reject measurement
#   6. fresh per-op trace + cost analysis -> roofline rebuild inputs
#   7. serving load bench on the real chip: checkpoint server, then
#      export-model --check (TPU round trip) + --from-exported server
#   8. commit logs + JSON artifacts
set -uo pipefail

PIDFILE=${1:-/tmp/flagship_r5.pid}
RUN_DIR=${2:-/root/repo/runs/flagship_r4}
cd /root/repo

# Bank whatever window logs exist so far (round-3 lesson, applied to
# logs too: a round-end cutoff must not lose completed legs).
bank() {
  mkdir -p "$RUN_DIR/bench"
  cp -f /tmp/r5_bench.log /tmp/r5_dblock_bench.log /tmp/r5_profile.log \
        /tmp/r5_eval.log /tmp/r5_gsx_check.log /tmp/r5_serve_load_ckpt.log \
        /tmp/r5_serve_load_gsx.log "$RUN_DIR/bench/" 2>/dev/null || true
  git add "$RUN_DIR/bench" 2>/dev/null || true
  git commit -q -m "Round-5 TPU window: bank $1 results" || true
}

if [ "$PIDFILE" = "none" ]; then
  echo "pidfile wait skipped by request (PIDFILE=none)"
elif [ -f "$PIDFILE" ]; then
  pid=$(cat "$PIDFILE")
  if kill -0 "$pid" 2>/dev/null; then
    echo "=== graceful stop $(date) ==="
    python -m gansynth_tpu.cli stop --model-dir "$RUN_DIR" --wait 600 \
      || echo "(stop not confirmed; falling through to pid wait)"
    echo "waiting for training supervisor (pid $pid) to exit..."
    while kill -0 "$pid" 2>/dev/null; do sleep 30; done
  fi
  echo "training exited at $(date)"
else
  echo "ERROR: pidfile $PIDFILE missing — refusing to contend with a" >&2
  echo "possibly-live TPU run (pass PIDFILE=none to skip the wait)" >&2
  exit 2
fi

echo "=== eval (n=488 + attribution, three detectors) $(date) ==="
timeout 3600 bash scripts/eval_r4.sh "$RUN_DIR" \
  > /tmp/r5_eval.log 2>&1
tail -8 /tmp/r5_eval.log

echo "=== committing flagship artifacts $(date) ==="
for f in ema.npz metrics.jsonl train_config.json eval_full.json; do
  [ -f "$RUN_DIR/$f" ] && git add "$RUN_DIR/$f" \
    || echo "(skip missing $RUN_DIR/$f)"
done
git commit -m "Flagship r5 extended release leg: EMA weights, metrics, full eval" \
  || echo "(nothing to commit)"

echo "=== bench.py full matrix $(date) ==="
timeout 3000 python bench.py > /tmp/r5_bench.log 2>&1
tail -2 /tmp/r5_bench.log
bank bench

echo "=== fused D-block microbench $(date) ==="
timeout 3000 python scripts/dblock_bench.py --repeats 3 \
  > /tmp/r5_dblock_bench.log 2>&1
tail -8 /tmp/r5_dblock_bench.log
bank dblock

echo "=== per-op trace + cost analysis $(date) ==="
timeout 2400 python scripts/profile_train_step.py \
  > /tmp/r5_profile.log 2>&1
tail -30 /tmp/r5_profile.log
bank trace

echo "=== serving load bench (checkpoint) $(date) ==="
python -m gansynth_tpu.cli serve --model-dir "$RUN_DIR" \
  --compute-dtype bfloat16 --port 8451 > /tmp/r5_serve_ckpt.log 2>&1 &
SRV=$!
for i in $(seq 1 120); do
  grep -q "serving on" /tmp/r5_serve_ckpt.log && break; sleep 5
done
timeout 240 python scripts/serve_load_bench.py --port 8451 \
  --clients 16 --notes-per-request 2 --warmup-seconds 10 --seconds 45 \
  --out "$RUN_DIR/bench/serve_load_ckpt.json" \
  > /tmp/r5_serve_load_ckpt.log 2>&1
kill "$SRV" 2>/dev/null; wait "$SRV" 2>/dev/null
tail -2 /tmp/r5_serve_load_ckpt.log
bank serve-ckpt

echo "=== export-model --check (TPU round trip) $(date) ==="
timeout 1800 python -m gansynth_tpu.cli export-model --model-dir "$RUN_DIR" \
  --output /tmp/flagship_r5.gsx --check \
  > /tmp/r5_gsx_check.log 2>&1
tail -3 /tmp/r5_gsx_check.log
bank gsx-check

echo "=== serving load bench (--from-exported) $(date) ==="
python -m gansynth_tpu.cli serve --from-exported /tmp/flagship_r5.gsx \
  --port 8452 > /tmp/r5_serve_gsx.log 2>&1 &
SRV=$!
for i in $(seq 1 120); do
  grep -q "serving on" /tmp/r5_serve_gsx.log && break; sleep 5
done
timeout 240 python scripts/serve_load_bench.py --port 8452 \
  --clients 16 --notes-per-request 2 --warmup-seconds 10 --seconds 45 \
  --out "$RUN_DIR/bench/serve_load_exported.json" \
  > /tmp/r5_serve_load_gsx.log 2>&1
kill "$SRV" 2>/dev/null; wait "$SRV" 2>/dev/null
tail -2 /tmp/r5_serve_load_gsx.log

echo "=== committing window artifacts $(date) ==="
mkdir -p "$RUN_DIR/bench"
cp -f /tmp/r5_bench.log /tmp/r5_dblock_bench.log /tmp/r5_profile.log \
      /tmp/r5_eval.log /tmp/r5_gsx_check.log /tmp/r5_serve_load_ckpt.log \
      /tmp/r5_serve_load_gsx.log "$RUN_DIR/bench/" 2>/dev/null || true
git add "$RUN_DIR/bench" && git commit -m \
  "Round-5 TPU window results: eval + bench matrix + D-block microbench + trace + serve load" \
  || echo "(nothing to commit)"

echo "=== done $(date) ==="
