"""Minimal synthesis server: HTTP in, WAV out.

The reference has no serving layer (generation is a CLI mode); this adds
one suitable for the "production serving" posture of the rebuild without
any dependency beyond the stdlib:

- ``POST /synthesize`` with JSON ``{"pitches": [60, 72], "seed": 0}`` →
  ``audio/wav`` body (notes concatenated), or ``{"format": "json"}`` →
  base64 WAV + metadata.
- ``GET /healthz`` → liveness + model info.

The sampler is compiled at startup for a LADDER of batch sizes (1, 4, ...,
max_batch; XLA-static shapes) and each request is padded only up to the
smallest rung that fits, so a 1-note request executes the 1-note program
instead of paying the full max_batch synthesis. Warm per-rung latency is
measured at startup and exposed on /healthz. Single-threaded by design:
one TPU, one compiled program at a time, requests serialize.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
import wave as wavmod
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Optional

import numpy as np

from gansynth_tpu.utils.config import Config


class SynthesisService:
    """Holds the compiled sampler; thread-safe synthesize()."""

    def __init__(
        self,
        config: Config,
        params,
        *,
        stage: Optional[int] = None,
        max_batch: int = 16,
    ):
        import jax

        from gansynth_tpu.synth import Sampler

        self.config = config
        self.max_batch = max_batch
        self._sampler = Sampler(config, params, stage=stage)
        self._lock = threading.Lock()
        self._jax = jax
        # Batch-size ladder: geometric rungs up to max_batch. jax.jit
        # specializes per shape, so warming each rung compiles its own
        # program once; requests then pad only to the smallest fitting
        # rung instead of always paying max_batch.
        ladder = []
        b = 1
        while b < max_batch:
            ladder.append(b)
            b *= 4
        self.batch_ladder = tuple(ladder) + (max_batch,)
        self.warm_latency_s = {}
        for b in self.batch_ladder:
            self._run(0, [60] * b)          # compile
            t0 = time.perf_counter()
            self._run(0, [60] * b)          # warm (host-observed E2E)
            self.warm_latency_s[b] = round(time.perf_counter() - t0, 4)

    def _run(self, seed: int, padded) -> np.ndarray:
        with self._lock:
            waves, _ = self._sampler(self._jax.random.key(seed), padded)
        # np.asarray forces the device->host fetch: honest request latency.
        return np.asarray(waves)

    def rung_for(self, n: int) -> int:
        """Smallest compiled batch that fits an n-note request."""
        for b in self.batch_ladder:
            if n <= b:
                return b
        raise ValueError(f"at most {self.max_batch} pitches per request")

    def synthesize(self, pitches, seed: int = 0) -> np.ndarray:
        """[len(pitches), 64000] float32; pads to the smallest rung."""
        if not pitches:
            raise ValueError("pitches must be non-empty")
        rung = self.rung_for(len(pitches))
        lo, hi = self.config.model.pitch_min, self.config.model.pitch_max
        for p in pitches:
            if not lo <= int(p) <= hi:
                raise ValueError(f"pitch {p} outside [{lo}, {hi}]")
        padded = list(pitches) + [lo] * (rung - len(pitches))
        return self._run(seed, padded)[: len(pitches)]

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
                port: int = 0) -> HTTPServer:
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
                    "max_batch": service.max_batch,
                    "batch_ladder": list(service.batch_ladder),
                    "warm_latency_s": {
                        str(k): v for k, v in service.warm_latency_s.items()
                    },
                    "num_pitches": m.num_pitches,
                    "sample_rate": service.config.audio.sample_rate,
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
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except json.JSONDecodeError:
                self._json(400, {"error": "invalid JSON body"})

    return HTTPServer((host, port), Handler)


def serve_forever(service: SynthesisService, host: str, port: int) -> None:
    server = make_server(service, host, port)
    print(f"serving on http://{server.server_address[0]}:"
          f"{server.server_address[1]}")
    server.serve_forever()
