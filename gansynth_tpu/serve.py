"""Minimal synthesis server: HTTP in, WAV out.

The reference has no serving layer (generation is a CLI mode); this adds
one suitable for the "production serving" posture of the rebuild without
any dependency beyond the stdlib:

- ``POST /synthesize`` with JSON ``{"pitches": [60, 72], "seed": 0}`` →
  ``audio/wav`` body (notes concatenated), or ``{"format": "json"}`` →
  base64 WAV + metadata.
- ``GET /healthz`` → liveness + model info.

The sampler is compiled once at startup for a fixed serving batch size
(requests are padded up to it, XLA-static shapes), so request latency is
pure device execution + WAV encoding. Single-threaded by design: one TPU,
one compiled program, requests serialize.
"""

from __future__ import annotations

import base64
import io
import json
import threading
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
        # Warm/compile for the serving batch size.
        self._sampler(jax.random.key(0), [60] * max_batch)

    def synthesize(self, pitches, seed: int = 0) -> np.ndarray:
        """[len(pitches), 64000] float32; pads to the compiled batch."""
        if not pitches:
            raise ValueError("pitches must be non-empty")
        if len(pitches) > self.max_batch:
            raise ValueError(
                f"at most {self.max_batch} pitches per request"
            )
        lo, hi = self.config.model.pitch_min, self.config.model.pitch_max
        for p in pitches:
            if not lo <= int(p) <= hi:
                raise ValueError(f"pitch {p} outside [{lo}, {hi}]")
        padded = list(pitches) + [lo] * (self.max_batch - len(pitches))
        with self._lock:
            waves, _ = self._sampler(self._jax.random.key(seed), padded)
        return np.asarray(waves)[: len(pitches)]

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
