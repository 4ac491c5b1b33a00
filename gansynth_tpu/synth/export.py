"""Portable serving artifacts: the seeded sampler as serialized StableHLO.

The reference ships generation as "load the Python model code + a
checkpoint" (SURVEY.md §3.2 C3). For production serving that couples the
deployed artifact to the training codebase; the TPU-native answer is
`jax.export`: ahead-of-time lower the WHOLE synthesis program — EMA
generator, mel pseudo-inverse, phase cumsum, matmul iSTFT — to one
StableHLO module with the weights baked in as constants, serialize it,
and run it anywhere a JAX runtime exists, with **zero** gansynth code or
checkpoint files on the serving host.

Design points:

- **Self-contained**: params are closed over, so they are inlined into
  the module as constants. One file is the whole synth (the fixed mel /
  DFT matrices dominate the size floor at ~21 MiB; generator weights add
  their fp32 size on top).
- **Multi-platform**: lowered for ``("cpu", "tpu")`` by default —
  `jax.export` embeds one module per platform and dispatches on the
  runtime backend, so the same artifact serves on a TPU slice and in a
  CPU canary/test job.
- **Symbolic batch** (default): the batch dimension is exported as a
  symbolic shape ``b``, so the serving layer's coalescing buckets
  (serve.py) all call one artifact; XLA still specializes per concrete
  batch at call time, exactly like the in-process sampler's per-shape
  jit cache.
- **Same contract as `make_seeded_sampler`**: per-note audio is a pure
  function of ``(seed_i, pitch_i)`` (each note derives its latent from
  its own key), so coalescing stays semantics-free. The loaded program
  is deterministic (same inputs -> same bytes) and exact per note
  within one batch shape; against the IN-PROCESS jit it agrees to
  ~1e-4 relative, not bitwise — the AOT-lowered module is a different
  XLA specialization, the same class of last-bits delta the DP sampler
  documents (sampler.py `make_dp_seeded_sampler`). Measured on the
  8-device CPU test mesh: 3.6e-5 relative under float32
  (tests/test_export.py pins a 1e-3 bound); ~0.09 relative under a
  bfloat16-compute model (round-3 flagship: waveform correlation
  >= 0.996, identical fundamental — re-ordered bf16 rounding, not a
  semantic change). ``export-model --check`` bounds both.

Portability note: loading the CPU lowering on a host whose CPU features
differ from the export machine's logs an XLA:CPU AOT machine-feature
warning; execution falls back safely (the round-trip check is the
arbiter — it verifies audio, not logs).

File format (``.gsx``): an 8-byte magic, a big-endian u32 header length,
a JSON header (format/version, step, stage, platforms, batch mode, and
the full effective config for provenance), then the `jax.export`
serialization bytes. Version 2 headers carry a ``programs`` table
(name + byte length, in file order) so one artifact can ship several
entry points; version-1 files (a single seeded program as the file
tail) still load.

Programs:

- ``seeded`` (always present): ``(seeds [b] i32, pitch [b] i32) ->
  wave [b, T]`` — the serving entry point.
- ``latent`` (opt-in, ``export-model --with-latent``): ``(z [b, D] f32,
  labels [b, P] f32) -> wave [b, T]`` — the interpolation/morph entry
  point (``cli interpolate --from-exported``), same math as
  `make_latent_sampler` (sampler.py `_latent_body`).

Size budget: each program inlines its constants, so the fixed synthesis
matrices (mel pseudo-inverse + iDFT bases, ~21 MiB at 128x1024) and the
fp32 generator weights are paid ONCE PER PROGRAM — ``--with-latent``
doubles the file (measured on the flagship model, cpu+tpu platforms,
symbolic batch: 54.6 MiB seeded-only, 109.2 MiB both programs).
Multi-platform lowering shares constants (one module,
platform-dispatched), so platforms are ~free; programs are not. Keep
serving artifacts seeded-only unless the host actually morphs.
"""

from __future__ import annotations

import dataclasses
import json
import struct
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from gansynth_tpu.synth.sampler import _latent_body, _seeded_body
from gansynth_tpu.utils.config import Config

GSX_MAGIC = b"GSYNTHX\n"
GSX_FORMAT = "gansynth-tpu-exported-sampler"
GSX_VERSION = 2
# Versions this loader understands. v1 = a single seeded program as the
# file tail (no `programs` table); v2 adds the table + optional latent
# program. Anything newer fails with an upgrade hint, never a deserialize
# crash on bytes it cannot interpret.
GSX_KNOWN_VERSIONS = (1, 2)


def _portable_config(config: Config) -> Config:
    """Pin the synthesis lowering to the portable 'xla' kernel for export.

    `synthesis_kernel='auto'` resolves against `jax.default_backend()` at
    TRACE time (ops/spectral.py), and `jax.export` traces ONCE for every
    platform in the artifact — so exporting from a TPU-backed process
    under 'auto'/'pallas' would bake a Mosaic `tpu_custom_call` into the
    module, which cannot lower for the 'cpu' platform and is not on
    `jax.export`'s stable custom-call allowlist (it may not deserialize
    across jaxlib versions even TPU-only). Exported artifacts therefore
    ALWAYS use the pure-StableHLO XLA lowering; the ~4.7% Pallas win
    (BENCH_r04 kernel matrix) applies to in-process serving only. The
    header records the pinned value so the artifact says what it runs.
    """
    if config.audio.synthesis_kernel == "xla":
        return config
    return dataclasses.replace(
        config,
        audio=dataclasses.replace(config.audio, synthesis_kernel="xla"),
    )


def export_sampler(
    config: Config,
    params,
    stage: Optional[int] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    batch: Optional[int] = None,
) -> jax_export.Exported:
    """Lower the seeded sampler to a multi-platform `Exported`.

    ``params`` (EMA generator params) are baked in as constants.
    ``batch=None`` exports a symbolic batch dimension (any batch size at
    call time); an int pins a static batch. Returns the `Exported`
    object — use :func:`save_sampler_artifact` to persist it. The
    synthesis lowering is pinned to the portable XLA kernel regardless
    of ``config.audio.synthesis_kernel`` (see :func:`_portable_config`).
    """
    config = _portable_config(config)
    stage = config.model.num_stages - 1 if stage is None else stage
    body = _seeded_body(config, stage)
    fn = jax.jit(lambda seeds, pitch: body(params, seeds, pitch))
    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b,), jnp.int32)
    return jax_export.export(fn, platforms=tuple(platforms))(spec, spec)


def export_latent_sampler(
    config: Config,
    params,
    stage: Optional[int] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    batch: Optional[int] = None,
) -> jax_export.Exported:
    """Lower the explicit-latent sampler ``(z [b, D], labels [b, P]) ->
    wave [b, T]`` to a multi-platform `Exported` — the artifact entry
    point behind checkpoint-free interpolation/morphing. Same math as
    `make_latent_sampler` (shared `_latent_body`); the image output is
    dropped so the serving host only transfers audio."""
    config = _portable_config(config)
    stage = config.model.num_stages - 1 if stage is None else stage
    body = _latent_body(config, stage)
    fn = jax.jit(lambda z, labels: body(params, z, labels)[0])
    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch)
    z_spec = jax.ShapeDtypeStruct(
        (b, config.model.latent_dim), jnp.float32
    )
    label_spec = jax.ShapeDtypeStruct(
        (b, config.model.num_pitches), jnp.float32
    )
    return jax_export.export(fn, platforms=tuple(platforms))(
        z_spec, label_spec
    )


def save_sampler_artifact(
    path: str,
    config: Config,
    params,
    step: int,
    stage: Optional[int] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    batch: Optional[int] = None,
    with_latent: bool = False,
) -> str:
    """Export + serialize the sampler into one ``.gsx`` file at ``path``.

    The header's ``config`` records the EFFECTIVE exported config (with
    ``synthesis_kernel`` pinned to 'xla' — `_portable_config`), so a
    loaded artifact's provenance matches the program it actually runs.
    ``with_latent=True`` additionally ships the latent-space program
    (~2x file size — constants are per-program; see the module
    docstring's size budget).
    """
    config = _portable_config(config)
    stage = config.model.num_stages - 1 if stage is None else stage
    exported = export_sampler(
        config, params, stage=stage, platforms=platforms, batch=batch
    )
    blobs = [("seeded", bytes(exported.serialize()))]
    if with_latent:
        latent = export_latent_sampler(
            config, params, stage=stage, platforms=platforms, batch=batch
        )
        blobs.append(("latent", bytes(latent.serialize())))
    header = json.dumps(
        {
            "format": GSX_FORMAT,
            "version": GSX_VERSION,
            "step": int(step),
            "stage": int(stage),
            "platforms": list(exported.platforms),
            "batch": "symbolic" if batch is None else int(batch),
            "sample_rate": config.audio.sample_rate,
            "pitch_min": config.model.pitch_min,
            "pitch_max": config.model.pitch_max,
            "programs": [
                {"name": name, "bytes": len(blob)} for name, blob in blobs
            ],
            "config": dataclasses.asdict(config),
        },
        sort_keys=True,
    ).encode("utf-8")
    with open(path, "wb") as f:
        f.write(GSX_MAGIC)
        f.write(struct.pack(">I", len(header)))
        f.write(header)
        for _, blob in blobs:
            f.write(blob)
    return path


class ExportedSampler:
    """A loaded ``.gsx`` artifact: ``sampler(seeds, pitch) -> wave``.

    ``seeds``/``pitch`` are int32 arrays of equal length B (any B when
    the artifact was exported with a symbolic batch); returns waveforms
    ``[B, audio_length]`` float32. ``meta`` carries the JSON header
    (step, stage, platforms, effective config). When the artifact was
    written with ``with_latent=True``, :meth:`latent` renders from
    explicit latents + soft pitch labels (the interpolation surface)."""

    def __init__(self, exported: jax_export.Exported, meta: dict,
                 latent: Optional[jax_export.Exported] = None):
        self._exported = exported
        self._latent = latent
        self.meta = meta
        self.platforms = tuple(meta["platforms"])
        self.step = int(meta["step"])
        self.stage = int(meta["stage"])
        self.sample_rate = int(meta["sample_rate"])

    @property
    def has_latent(self) -> bool:
        return self._latent is not None

    def latent(self, z, labels) -> jax.Array:
        """``(z [B, D] f32, labels [B, num_pitches] f32) -> wave [B, T]``.

        Raises ValueError when the artifact ships only the seeded
        program (v1 files, or v2 exported without ``--with-latent``)."""
        if self._latent is None:
            raise ValueError(
                "artifact has no latent program (re-export with "
                "--with-latent to enable interpolation)"
            )
        z = jnp.asarray(z, jnp.float32)
        labels = jnp.asarray(labels, jnp.float32)
        if z.ndim != 2 or labels.ndim != 2 or z.shape[0] != labels.shape[0]:
            raise ValueError(
                f"z {z.shape} and labels {labels.shape} must be rank-2 "
                "[B, D] / [B, num_pitches] with matching B"
            )
        return self._latent.call(z, labels)

    def config(self) -> Config:
        """Rebuild the effective `Config` recorded in the header."""
        return Config().with_overrides(self.meta["config"])

    def __call__(self, seeds, pitch) -> jax.Array:
        seeds = jnp.asarray(seeds, jnp.int32)
        pitch = jnp.asarray(pitch, jnp.int32)
        if seeds.ndim != 1 or seeds.shape != pitch.shape:
            raise ValueError(
                f"seeds {seeds.shape} and pitch {pitch.shape} must match "
                "and be rank-1 [B]"
            )
        return self._exported.call(seeds, pitch)


def load_sampler_artifact(path: str) -> ExportedSampler:
    """Load a ``.gsx`` file written by :func:`save_sampler_artifact`."""
    import os

    with open(path, "rb") as f:
        magic = f.read(len(GSX_MAGIC))
        if magic != GSX_MAGIC:
            raise ValueError(f"{path}: not a gansynth export (bad magic)")
        lenbytes = f.read(4)
        if len(lenbytes) != 4:
            raise ValueError(f"{path}: truncated header length")
        (hlen,) = struct.unpack(">I", lenbytes)
        # Bound the declared header length by what the file can actually
        # hold — a corrupt length field must fail fast, not attempt a
        # multi-GiB read.
        limit = os.fstat(f.fileno()).st_size - len(GSX_MAGIC) - 4
        if hlen > limit:
            raise ValueError(
                f"{path}: header length {hlen} exceeds file size "
                "(corrupt or truncated artifact)"
            )
        meta = json.loads(f.read(hlen).decode("utf-8"))
        if meta.get("format") != GSX_FORMAT:
            raise ValueError(f"{path}: unexpected format {meta.get('format')!r}")
        version = meta.get("version")
        if version not in GSX_KNOWN_VERSIONS:
            raise ValueError(
                f"{path}: format version {version} is newer than this "
                f"gansynth_tpu understands (known: "
                f"{list(GSX_KNOWN_VERSIONS)}) — upgrade the package"
            )
        if version == 1:
            # v1: the whole file tail is one seeded program.
            programs = {"seeded": f.read()}
        else:
            programs = {}
            for entry in meta["programs"]:
                blob = f.read(int(entry["bytes"]))
                if len(blob) != int(entry["bytes"]):
                    raise ValueError(
                        f"{path}: program {entry['name']!r} truncated "
                        f"({len(blob)} of {entry['bytes']} bytes)"
                    )
                programs[str(entry["name"])] = blob
    if "seeded" not in programs:
        raise ValueError(f"{path}: artifact has no 'seeded' program")
    exported = jax_export.deserialize(bytearray(programs["seeded"]))
    latent = None
    if "latent" in programs:
        latent = jax_export.deserialize(bytearray(programs["latent"]))
    return ExportedSampler(exported, meta, latent=latent)
