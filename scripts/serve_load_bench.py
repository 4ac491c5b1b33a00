"""Sustained-load benchmark against a LIVE `cli serve` endpoint
(VERDICT-r4 item 4: the coalescing/backpressure/DP serving features are
unit-tested, but no committed artifact showed concurrent-client RPS and
tail latency on the real chip).

Drives an already-running server (start it yourself — checkpoint or
--from-exported; this script deliberately does NOT own the process, so
the same harness measures every serving mode):

    python -m gansynth_tpu.cli serve --model-dir runs/flagship_r4 &
    python scripts/serve_load_bench.py --port 8400 \
        --out runs/flagship_r4/bench/serve_load.json

Method: C closed-loop clients (each POSTs `--notes-per-request` random
pitches, waits, repeats) for a timed steady-state window after a warmup
window. Reports client-side RPS and notes/s, p50/p90/p99 request
latency, HTTP status mix (200/429/504), and the server's own /healthz
counter DELTAS over the window — device batches, coalesced-batch share,
and mean notes per device batch (the coalescing fill the batcher
actually achieved under this load).
"""

import argparse
import json
import threading
import time
import urllib.error
import urllib.request


def _healthz(base):
    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        return json.loads(r.read())


def _client(base, notes, stop, out, seed0):
    rng = seed0
    while not stop.is_set():
        rng = (rng * 6364136223846793005 + 1442695040888963407) % 2**63
        pitches = [24 + (rng >> (7 * i)) % 61 for i in range(notes)]
        body = json.dumps(
            {"pitches": pitches, "seed": rng % 10000}
        ).encode()
        req = urllib.request.Request(
            f"{base}/synthesize", data=body,
            headers={"Content-Type": "application/json"},
        )
        t0 = time.perf_counter()
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                r.read()
                code = r.status
        except urllib.error.HTTPError as e:
            e.read()
            code = e.code
        except Exception:
            code = -1
        out.append((time.perf_counter() - t0, code))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8400)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--notes-per-request", type=int, default=2)
    p.add_argument("--warmup-seconds", type=float, default=10.0)
    p.add_argument("--seconds", type=float, default=45.0)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    base = f"http://{args.host}:{args.port}"

    h0 = _healthz(base)
    print(f"server up: max_batch={h0['max_batch']} "
          f"exported={h0.get('exported_artifact')} "
          f"mesh={h0.get('mesh_devices')}", flush=True)

    stop = threading.Event()
    results: list = []
    threads = [
        threading.Thread(
            target=_client,
            args=(base, args.notes_per_request, stop, results, 12345 + i),
            daemon=True,
        )
        for i in range(args.clients)
    ]
    for t in threads:
        t.start()

    time.sleep(args.warmup_seconds)
    results.clear()                     # drop warmup samples
    h_start = _healthz(base)
    t_start = time.perf_counter()
    time.sleep(args.seconds)
    window = list(results)              # snapshot before stopping
    elapsed = time.perf_counter() - t_start
    h_end = _healthz(base)
    stop.set()
    for t in threads:
        t.join(timeout=130)

    lat = sorted(r[0] for r in window if r[1] == 200)
    codes: dict = {}
    for _, c in window:
        codes[str(c)] = codes.get(str(c), 0) + 1

    def pct(q):
        return round(lat[min(int(q * len(lat)), len(lat) - 1)] * 1e3, 1) \
            if lat else None

    d_batches = h_end["device_batches"] - h_start["device_batches"]
    d_coalesced = h_end["coalesced_batches"] - h_start["coalesced_batches"]
    d_requests = h_end["requests_served"] - h_start["requests_served"]
    report = {
        "clients": args.clients,
        "notes_per_request": args.notes_per_request,
        "window_seconds": round(elapsed, 1),
        "requests_completed": len(window),
        "rps": round(len(window) / elapsed, 2),
        "notes_per_sec": round(
            len([1 for _, c in window if c == 200])
            * args.notes_per_request / elapsed, 1),
        "latency_ms": {"p50": pct(0.50), "p90": pct(0.90), "p99": pct(0.99)},
        "status_counts": codes,
        "server_window": {
            "requests_served": d_requests,
            "device_batches": d_batches,
            "coalesced_share": round(d_coalesced / d_batches, 3)
            if d_batches else None,
            "mean_notes_per_device_batch": round(
                d_requests * args.notes_per_request / d_batches, 2)
            if d_batches else None,
            "rejected_429": h_end["requests_rejected"]
            - h_start["requests_rejected"],
            "timed_out_504": h_end["requests_timed_out"]
            - h_start["requests_timed_out"],
        },
        "server_info": {
            "max_batch": h0["max_batch"],
            "exported_artifact": h0.get("exported_artifact"),
            "mesh_devices": h0.get("mesh_devices"),
            "warm_latency_s": h0.get("warm_latency_s"),
        },
    }
    print(json.dumps(report), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
