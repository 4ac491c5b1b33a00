"""Real-data validation gate (`cli validate-data`).

All training on this machine has used synthetic NSynth-schema fixtures —
no real NSynth TFRecords have ever been available (NEXT.md known
limitation #1). This module is the committed gate that proves the
framework against real data in minutes the day it appears (SURVEY.md
§2.1 D1–D3): one command checks, in order,

1. **Schema completeness** — every sampled example parses the full D1
   schema with a 64000-sample float32 waveform, a MIDI pitch, and the
   metadata fields (velocity / instrument_family / instrument_source /
   qualities) actually populated, through BOTH ingest paths (tf.data and
   the first-party C++ reader) so a real-file quirk in either parser
   surfaces immediately.
2. **Distributions** — pitch / family / source histograms plus the size
   of the trainable acoustic subset (instrument_source == 0, pitch in
   [24, 84]): the filters D2 applies have only ever seen fixtures, so
   the first real-data question is "how many examples survive them".
3. **Decode throughput** — examples/s on this host with the full
   training contract vs the measured device demand (~66 ex/s/chip at
   stage 6), the SURVEY §7 hard-part-4 margin on the actual files.
4. **Training superstep + spectral eval** — one real jitted WGAN-GP
   superstep at a low stage fed by the file's own batches (loss
   finiteness, param movement), and the S11 roundtrip SNR of sampled
   real waveforms through the mel-IF image — the data-side half of
   driver config 1 on real audio.

Everything returns one JSON-serializable report; `ok` aggregates the
pass/fail checks (distribution shape is reported, not judged).
"""

from __future__ import annotations

import collections
import time
from typing import Dict, Optional, Sequence

import numpy as np

from gansynth_tpu.utils.config import Config

# Measured stage-6 device demand (BENCH_r04: 8.26 steps/s x batch 8).
DEMAND_EXAMPLES_PER_SEC_PER_CHIP = 66.0


def _schema_and_distributions(
    files: Sequence[str], config: Config, max_examples: int
) -> Dict:
    """Checks 1+2: parse up to ``max_examples`` through both ingest paths,
    field-checking each example and accumulating distributions."""
    from gansynth_tpu.data.native_tfrecord import read_examples
    from gansynth_tpu.data.nsynth import make_nsynth_example_iterator

    audio_len = config.audio.audio_length
    lo, hi = config.model.pitch_min, config.model.pitch_max
    pitch_hist: collections.Counter = collections.Counter()
    family_hist: collections.Counter = collections.Counter()
    source_hist: collections.Counter = collections.Counter()
    problems = []
    n = 0
    trainable = 0

    def check(i, audio, pitch, velocity, family, source, qualities, path):
        nonlocal n, trainable
        n += 1
        if audio.size != audio_len:
            problems.append(
                f"{path}[{i}]: audio length {audio.size} != {audio_len}"
            )
        if not np.isfinite(audio).all():
            problems.append(f"{path}[{i}]: non-finite audio samples")
        if not (0 <= pitch <= 127):
            problems.append(f"{path}[{i}]: pitch {pitch} outside MIDI range")
        if velocity < 0:
            problems.append(f"{path}[{i}]: velocity field missing")
        if family < 0:
            problems.append(f"{path}[{i}]: instrument_family field missing")
        pitch_hist[int(pitch)] += 1
        family_hist[int(family)] += 1
        source_hist[int(source)] += 1
        if source == 0 and lo <= pitch <= hi:
            trainable += 1

    for path in files:
        for i, ex in enumerate(read_examples(path, audio_length=audio_len)):
            if n >= max_examples:
                break
            check(i, ex.audio, ex.pitch, ex.velocity, ex.instrument_family,
                  ex.instrument_source, ex.qualities, path)
        if n >= max_examples:
            break

    # Cross-parser agreement on a small prefix: the native reader and
    # tf.data must see the SAME bytes (the byte-equivalence tests pin
    # this on fixtures; here it runs against the real files).
    n_cross = 0
    try:
        native_it = (
            ex
            for path in files
            for ex in read_examples(path, audio_length=audio_len)
        )
        for tf_ex, nat_ex in zip(
            make_nsynth_example_iterator(files, config), native_it
        ):
            if n_cross >= min(16, max_examples):
                break
            if int(tf_ex["pitch"]) != nat_ex.pitch or not np.array_equal(
                np.asarray(tf_ex["audio"], np.float32), nat_ex.audio
            ):
                problems.append(
                    f"cross-parser mismatch at example {n_cross}: "
                    "tf.data and the native reader decode different data"
                )
            n_cross += 1
    except Exception as e:  # tf missing is not a data problem
        problems.append(f"cross-parser check unavailable: {e}")

    return {
        "examples_scanned": n,
        "schema_problems": problems[:20],
        "schema_ok": not problems,
        "trainable_acoustic_in_range": trainable,
        "pitch_histogram": {str(k): v for k, v in sorted(pitch_hist.items())},
        "family_histogram": {
            str(k): v for k, v in sorted(family_hist.items())
        },
        "source_histogram": {
            str(k): v for k, v in sorted(source_hist.items())
        },
    }


def _decode_throughput(
    files: Sequence[str], config: Config, ingest: str, seconds: float
) -> Dict:
    """Check 3: sustained decode examples/s with the training contract."""
    if ingest == "native":
        from gansynth_tpu.data.native_tfrecord import (
            make_native_iterator as make_iterator,
        )
    else:
        from gansynth_tpu.data.nsynth import (
            make_nsynth_iterator as make_iterator,
        )
    batch = 64
    it = make_iterator(
        [str(f) for f in files], config, acoustic_only=False,
        batch_size=batch, shuffle=True, repeat=True, seed=0,
    )
    next(it)  # warmup: file open + shuffle fill
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        next(it)
        n += batch
    eps = n / (time.perf_counter() - t0)
    return {
        "decode_examples_per_sec": round(eps, 1),
        "decode_headroom_vs_chip": round(
            eps / DEMAND_EXAMPLES_PER_SEC_PER_CHIP, 1
        ),
        "decode_ok": eps >= DEMAND_EXAMPLES_PER_SEC_PER_CHIP,
        "decode_ingest": ingest,
    }


def _superstep_and_roundtrip(
    files: Sequence[str], config: Config, ingest: str, stage: int
) -> Dict:
    """Check 4: one real training superstep on the file's own batches +
    S11 roundtrip SNR of real waveforms (driver config 1 on real data)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gansynth_tpu.ops.spectral import image_to_wave, wave_to_image
    from gansynth_tpu.train import create_train_state, make_superstep

    if ingest == "native":
        from gansynth_tpu.data.native_tfrecord import (
            make_native_iterator as make_iterator,
        )
    else:
        from gansynth_tpu.data.nsynth import (
            make_nsynth_iterator as make_iterator,
        )

    batch = 8
    cfg = dataclasses.replace(
        config,
        train=dataclasses.replace(config.train, batch_size=batch),
    )
    it = make_iterator(
        [str(f) for f in files], cfg, acoustic_only=True,
        batch_size=batch, shuffle=True, repeat=True, seed=0,
    )
    try:
        wave, pitch = next(it)
    except StopIteration:
        return {
            "train_check_ok": False,
            "train_check_error": "no trainable examples survive the "
            "acoustic-subset + pitch filters",
        }

    # Spectral roundtrip on the REAL waveforms (lossy only at the mel
    # pseudo-inverse; fixture tones measure ~18 dB, broadband real audio
    # lands lower — the gate checks sanity, not a fidelity bar).
    img = wave_to_image(jnp.asarray(wave), cfg.audio)
    recon = np.asarray(image_to_wave(img, cfg.audio))
    err = wave - recon
    snr = 10 * np.log10(
        np.sum(wave**2, axis=-1)
        / np.maximum(np.sum(err**2, axis=-1), 1e-30)
    )

    state = create_train_state(cfg, seed=0)
    step = jax.jit(make_superstep(cfg, stage), donate_argnums=0)
    g_before = float(
        sum(abs(np.asarray(l)).sum() for l in jax.tree.leaves(state.g_params))
    )
    k = 2
    waves = np.stack([wave, np.asarray(next(it)[0])])[:k]
    pitches = np.stack([pitch, np.asarray(next(it)[1])])[:k]
    state, metrics = step(
        state, jnp.asarray(waves), jnp.asarray(pitches),
        jnp.ones((k,), jnp.float32),
    )
    d_loss = float(metrics["d_loss"])
    g_loss = float(metrics["g_loss"])
    g_after = float(
        sum(abs(np.asarray(l)).sum() for l in jax.tree.leaves(state.g_params))
    )
    ok = (
        np.isfinite(d_loss)
        and np.isfinite(g_loss)
        and g_after != g_before
        and bool(np.isfinite(snr).all())
    )
    return {
        "train_check_ok": bool(ok),
        "train_check_stage": stage,
        "train_d_loss": d_loss,
        "train_g_loss": g_loss,
        "train_params_moved": g_after != g_before,
        "roundtrip_snr_db_min": round(float(snr.min()), 2),
        "roundtrip_snr_db_median": round(float(np.median(snr)), 2),
    }


def validate_data(
    files: Sequence[str],
    config: Optional[Config] = None,
    *,
    max_examples: int = 2048,
    ingest: str = "tfdata",
    throughput_seconds: float = 3.0,
    train_stage: int = 2,
    run_train_check: bool = True,
) -> Dict:
    """Run the full gate; returns the JSON-serializable report.

    ``ok`` is the AND of the pass/fail checks (schema, decode headroom,
    superstep + roundtrip); histograms are informational.
    """
    config = config or Config()
    report: Dict = {"files": [str(f) for f in files]}
    report.update(_schema_and_distributions(files, config, max_examples))
    # Real-file quirks (e.g. a record tf.io's FixedLenFeature rejects) must
    # surface as a failed check with the exception message, never as a
    # crashed gate — the gate's whole point is a readable verdict on
    # never-before-seen data.
    try:
        report.update(_decode_throughput(files, config, ingest,
                                         throughput_seconds))
    except Exception as e:
        report.update({"decode_ok": False, "decode_ingest": ingest,
                       "decode_error": f"{type(e).__name__}: {e}"})
    if run_train_check:
        try:
            report.update(
                _superstep_and_roundtrip(files, config, ingest, train_stage)
            )
        except Exception as e:
            report.update({
                "train_check_ok": False,
                "train_check_error": f"{type(e).__name__}: {e}",
            })
    checks = [report["schema_ok"], report["decode_ok"]]
    if run_train_check:
        checks.append(report["train_check_ok"])
    if report["trainable_acoustic_in_range"] == 0:
        report["warning"] = (
            "0 scanned examples survive the acoustic-subset + pitch "
            "filters — training on these files would see no data"
        )
        checks.append(False)
    report["ok"] = all(checks)
    return report
