"""Minimal synthesis server: HTTP in, WAV out.

The reference has no serving layer (generation is a CLI mode); this adds
one suitable for the "production serving" posture of the rebuild without
any dependency beyond the stdlib:

- ``POST /synthesize`` with JSON ``{"pitches": [60, 72], "seed": 0}`` →
  ``audio/wav`` body (notes concatenated), or ``{"format": "json"}`` →
  base64 WAV + metadata.
- ``GET /healthz`` → liveness + model info.

The sampler is compiled at startup for a LADDER of batch sizes (1, 4, ...,
max_batch; XLA-static shapes). Concurrent requests COALESCE: a batcher
thread drains whatever requests are waiting while the device is busy,
packs their notes into the smallest rung that fits, and runs ONE device
program for all of them — so under load the TPU synthesizes full batches
instead of serializing 1-note programs. Per-note latents derive from
per-note seeds (synth.make_seeded_sampler), making a note's audio a pure
function of (params, seed, pitch, note-index) — byte-identical whether it
was coalesced or served alone on the same rung. Warm per-rung latency is
measured at startup and exposed on /healthz with the coalescing counters.
"""

from __future__ import annotations

import base64
import collections
import io
import json
import threading
import time
import wave as wavmod
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from gansynth_tpu.utils.config import Config


class ServiceOverloadedError(RuntimeError):
    """Queue is at capacity — the client should back off (HTTP 429)."""


class RequestTimeoutError(RuntimeError):
    """The request did not complete in time (HTTP 504) — e.g. a wedged
    device dispatch. The request is abandoned, never served late."""


class _Request:
    __slots__ = ("seeds", "pitches", "done", "result", "error", "abandoned")

    def __init__(self, seeds, pitches):
        self.seeds = seeds
        self.pitches = pitches
        self.done = threading.Event()
        self.result = None
        self.error = None
        self.abandoned = False


class SynthesisService:
    """Holds the compiled per-rung samplers and the coalescing batcher."""

    def __init__(
        self,
        config: Config,
        params,
        *,
        stage: Optional[int] = None,
        max_batch: int = 16,
        max_queue_notes: int = 256,
        request_timeout_s: float = 30.0,
        mesh=None,
        exported=None,
    ):
        import jax  # noqa: F401  (device runtime)
        import jax.numpy as jnp

        from gansynth_tpu.synth.sampler import (
            make_dp_seeded_sampler,
            make_seeded_sampler,
        )

        self.config = config
        self.mesh = mesh
        # Backpressure bounds (SURVEY.md §5 failure posture): an unbounded
        # queue turns a wedged device into every client blocking forever,
        # invisibly. Overflow -> 429; staleness -> 504 with the request
        # abandoned (never served late).
        self.max_queue_notes = max_queue_notes
        self.request_timeout_s = request_timeout_s
        self._jnp = jnp
        self.exported = exported is not None
        if exported is not None:
            # Checkpoint-free serving from a .gsx artifact
            # (synth/export.py): the AOT-lowered program replaces the
            # in-process sampler; no params live in the service at all.
            # The artifact must carry a symbolic batch dim — the rung
            # ladder calls one program at many batch sizes — and is a
            # single-program module, so it composes with coalescing and
            # backpressure but not with mesh sharding.
            if mesh is not None:
                raise ValueError(
                    "artifact serving is a single lowered program; "
                    "--data-parallel needs in-process params"
                )
            if exported.meta.get("batch") != "symbolic":
                raise ValueError(
                    "serving needs a symbolic-batch artifact (export "
                    "without --batch); this one is pinned to batch "
                    f"{exported.meta.get('batch')}"
                )
            n = 1
            self._params = None
            self._sample = lambda params, seeds, pitch: exported(
                seeds, pitch
            )
        elif mesh is not None:
            # Data-parallel serving: one coalesced batch shards across the
            # slice (params replicated). Per-note audio is unchanged —
            # each note's latent derives from its own seed — so scaling
            # out is invisible to clients. Rungs must divide the mesh, so
            # the ladder is built in mesh-size multiples.
            from gansynth_tpu.parallel.sharding import replicated_sharding

            n = mesh.devices.size
            max_batch = -(-max_batch // n) * n  # round up to a multiple
            self._params = jax.device_put(params, replicated_sharding(mesh))
            self._sample = make_dp_seeded_sampler(config, mesh, stage=stage)
        else:
            n = 1
            self._params = params
            self._sample = make_seeded_sampler(config, stage=stage)
        self.max_batch = max_batch
        # Batch-size ladder: geometric rungs up to max_batch. jax.jit
        # specializes per shape, so warming each rung compiles its own
        # program once; coalesced batches pad only to the smallest fitting
        # rung instead of always paying max_batch. Under a mesh every
        # rung is a multiple of the device count (the batch axis must
        # divide the mesh).
        ladder = []
        b = n
        while b < max_batch:
            ladder.append(b)
            b *= 4
        self.batch_ladder = tuple(ladder) + (max_batch,)
        self.requests_served = 0
        self.coalesced_batches = 0
        self.device_batches = 0
        self.requests_rejected = 0
        self.requests_timed_out = 0
        self._queued_notes = 0      # notes waiting in _queue
        self._in_flight_notes = 0   # notes inside the current device call

        self.warm_latency_s = {}
        for b in self.batch_ladder:
            self._run_device([0] * b, [60] * b)     # compile
            t0 = time.perf_counter()
            self._run_device([0] * b, [60] * b)     # warm (host E2E)
            self.warm_latency_s[b] = round(time.perf_counter() - t0, 4)

        self._queue = collections.deque()
        self._cond = threading.Condition()
        self._batcher = threading.Thread(target=self._batch_loop, daemon=True)
        self._batcher.start()

    def _run_device(self, seeds, pitches) -> np.ndarray:
        waves = self._sample(
            self._params,
            self._jnp.asarray(seeds, self._jnp.int32),
            self._jnp.asarray(pitches, self._jnp.int32),
        )
        # np.asarray forces the device->host fetch: honest request latency.
        return np.asarray(waves)

    def rung_for(self, n: int) -> int:
        """Smallest compiled batch that fits an n-note request."""
        for b in self.batch_ladder:
            if n <= b:
                return b
        raise ValueError(f"at most {self.max_batch} pitches per request")

    def _batch_loop(self) -> None:
        while True:
            with self._cond:
                while not self._queue:
                    self._cond.wait()
                batch = []
                n = 0
                # Coalesce whatever is already waiting, up to the largest
                # rung. Requests never split across batches. Timed-out
                # (abandoned) requests are discarded here, not served.
                while self._queue and (
                    not batch
                    or n + len(self._queue[0].pitches) <= self.max_batch
                ):
                    req = self._queue.popleft()
                    self._queued_notes -= len(req.pitches)
                    if req.abandoned:
                        continue
                    n += len(req.pitches)
                    batch.append(req)
                if not batch:
                    continue
                self._in_flight_notes = n
            try:
                rung = self.rung_for(n)
                seeds = [s for r in batch for s in r.seeds]
                pitches = [p for r in batch for p in r.pitches]
                pad = rung - n
                waves = self._run_device(
                    seeds + [0] * pad,
                    pitches + [self.config.model.pitch_min] * pad,
                )
                off = 0
                for r in batch:
                    r.result = waves[off:off + len(r.pitches)]
                    off += len(r.pitches)
                self.requests_served += len(batch)
                self.device_batches += 1
                if len(batch) > 1:
                    self.coalesced_batches += 1
            except Exception as e:  # surfaced on the request thread
                for r in batch:
                    r.error = e
            finally:
                with self._cond:
                    self._in_flight_notes = 0
            for r in batch:
                r.done.set()

    def synthesize(
        self, pitches, seed: int = 0, timeout_s: Optional[float] = None
    ) -> np.ndarray:
        """[len(pitches), 64000] float32.

        Note i's latent key is ``hash(seed, i)`` — deterministic per
        (seed, pitch list position), independent of coalescing. Caveat: a
        note's audio is byte-stable only per batch RUNG — the same request
        can land on different rungs depending on co-arriving traffic, and
        XLA's batch-size specialization may differ in the last bits across
        rungs. When byte-stability matters, pin the rung by sending
        exactly ``max_batch`` notes (documented on ``/healthz``).

        Raises :class:`ServiceOverloadedError` when the queue is at
        capacity and :class:`RequestTimeoutError` when the request does
        not finish within ``timeout_s`` (default: the service's
        ``request_timeout_s``) — the request is abandoned, so a wedged
        device fails fast instead of blocking every client forever.
        """
        if not pitches:
            raise ValueError("pitches must be non-empty")
        if len(pitches) > self.max_batch:
            raise ValueError(f"at most {self.max_batch} pitches per request")
        lo, hi = self.config.model.pitch_min, self.config.model.pitch_max
        for p in pitches:
            if not lo <= int(p) <= hi:
                raise ValueError(f"pitch {p} outside [{lo}, {hi}]")
        seeds = [
            (int(seed) * 1000003 + i) & 0x7FFFFFFF
            for i in range(len(pitches))
        ]
        req = _Request(seeds, [int(p) for p in pitches])
        with self._cond:
            if self._queued_notes + len(pitches) > self.max_queue_notes:
                self.requests_rejected += 1
                raise ServiceOverloadedError(
                    f"queue full ({self._queued_notes} notes waiting, "
                    f"limit {self.max_queue_notes}); retry later"
                )
            self._queue.append(req)
            self._queued_notes += len(pitches)
            self._cond.notify()
        timeout = self.request_timeout_s if timeout_s is None else timeout_s
        if not req.done.wait(timeout):
            with self._cond:
                req.abandoned = True
                self.requests_timed_out += 1
            raise RequestTimeoutError(
                f"request not served within {timeout:.1f}s "
                "(device stalled or overloaded)"
            )
        if req.error is not None:
            raise req.error
        return req.result

    def wav_bytes(self, waves: np.ndarray) -> bytes:
        buf = io.BytesIO()
        pcm = (np.clip(waves.reshape(-1), -1, 1) * 32767).astype(np.int16)
        with wavmod.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(self.config.audio.sample_rate)
            f.writeframes(pcm.tobytes())
        return buf.getvalue()


def make_server(service: SynthesisService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Build (not run) the HTTP server; ``.server_address`` has the port."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj):
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                m = service.config.model
                self._json(200, {
                    "status": "ok",
                    "mesh_devices": (
                        int(service.mesh.devices.size)
                        if service.mesh is not None else None
                    ),
                    "max_batch": service.max_batch,
                    "batch_ladder": list(service.batch_ladder),
                    "warm_latency_s": {
                        str(k): v for k, v in service.warm_latency_s.items()
                    },
                    "requests_served": service.requests_served,
                    "device_batches": service.device_batches,
                    "coalesced_batches": service.coalesced_batches,
                    "requests_rejected": service.requests_rejected,
                    "requests_timed_out": service.requests_timed_out,
                    "queued_notes": service._queued_notes,
                    "in_flight_notes": service._in_flight_notes,
                    "max_queue_notes": service.max_queue_notes,
                    "request_timeout_s": service.request_timeout_s,
                    "num_pitches": m.num_pitches,
                    "sample_rate": service.config.audio.sample_rate,
                    # True when serving a .gsx StableHLO artifact
                    # (checkpoint-free; synth/export.py).
                    "exported_artifact": service.exported,
                    # Byte-stability contract: a note's audio is a pure
                    # function of (params, seed, pitch) per batch RUNG
                    # and device placement; coalescing may move a request
                    # across rungs, and a mesh-sharded service runs a
                    # different XLA specialization than a single-device
                    # one — either can differ in the last float bits.
                    "determinism": (
                        "per-rung" if service.mesh is None
                        else "per-rung-per-mesh"
                    ),
                })
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/synthesize":
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                pitches = [int(p) for p in req.get("pitches", [])]
                seed = int(req.get("seed", 0))
                waves = service.synthesize(pitches, seed)
                wav = service.wav_bytes(waves)
                if req.get("format") == "json":
                    self._json(200, {
                        "num_notes": len(pitches),
                        "sample_rate": service.config.audio.sample_rate,
                        "wav_base64": base64.b64encode(wav).decode(),
                    })
                else:
                    self._reply(200, wav, "audio/wav")
            except ServiceOverloadedError as e:
                self._json(429, {"error": str(e)})
            except RequestTimeoutError as e:
                self._json(504, {"error": str(e)})
            except json.JSONDecodeError:
                # Before ValueError: JSONDecodeError subclasses it.
                self._json(400, {"error": "invalid JSON body"})
            except ValueError as e:
                self._json(400, {"error": str(e)})

    # Threaded: request handlers block on the coalescing queue, so
    # concurrency at the HTTP layer is what lets batches form under load.
    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(service: SynthesisService, host: str, port: int) -> None:
    server = make_server(service, host, port)
    print(f"serving on http://{server.server_address[0]}:"
          f"{server.server_address[1]}")
    server.serve_forever()
