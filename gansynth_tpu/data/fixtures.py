"""Synthetic NSynth-like fixtures (SURVEY.md §4 item 5).

Generates sine-with-harmonics notes at known MIDI pitches and writes them
as TFRecords with the NSynth schema, so integration tests and smoke
training runs need no real dataset. Pure numpy for synthesis; TF is only
imported (lazily) to serialize records.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def midi_to_hz(pitch) -> np.ndarray:
    return 440.0 * 2.0 ** ((np.asarray(pitch, dtype=np.float64) - 69.0) / 12.0)


def synthesize_note(
    pitch: int,
    *,
    sample_rate: int = 16000,
    length: int = 64000,
    num_harmonics: int = 4,
    decay: float = 1.5,
    seed: Optional[int] = None,
) -> np.ndarray:
    """One note: harmonic stack at the MIDI pitch with exponential decay."""
    rng = np.random.default_rng(pitch if seed is None else seed)
    t = np.arange(length) / sample_rate
    f0 = float(midi_to_hz(pitch))
    wave = np.zeros(length)
    for h in range(1, num_harmonics + 1):
        if f0 * h >= sample_rate / 2:
            break
        amp = 1.0 / h * (0.8 + 0.4 * rng.random())
        wave += amp * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi))
    wave *= np.exp(-t * decay)
    wave /= max(np.abs(wave).max(), 1e-9)
    return (0.9 * wave).astype(np.float32)


def write_synthetic_tfrecords(
    path: str,
    *,
    num_examples: int = 64,
    pitches: Optional[Sequence[int]] = None,
    sample_rate: int = 16000,
    length: int = 64000,
    seed: int = 0,
) -> str:
    """Write NSynth-schema TFRecords of synthetic notes; returns ``path``.

    Schema matches the fields the reference's parser consumes (D1):
    ``audio`` float[64000], ``pitch`` int64, plus ``velocity``,
    ``instrument_family``, ``instrument_source``, ``qualities`` so a
    schema-complete parser also works against real NSynth files.
    """
    import tensorflow as tf  # host-side only

    rng = np.random.default_rng(seed)
    pitches = list(pitches) if pitches is not None else list(range(24, 85))
    with tf.io.TFRecordWriter(path) as writer:
        for i in range(num_examples):
            pitch = int(pitches[i % len(pitches)])
            # Timbre diversity (deterministic in `seed`): vary the
            # harmonic count and the decay so the generator has to model a
            # distribution per pitch, not memorize one waveform.
            audio = synthesize_note(
                pitch, sample_rate=sample_rate, length=length,
                num_harmonics=int(rng.integers(2, 7)),
                decay=float(rng.uniform(0.8, 2.2)),
                seed=int(rng.integers(0, 2**31)),
            )
            # Metadata varies deterministically in ``seed`` so schema
            # round-trip tests see non-degenerate values in every field
            # (velocity uses NSynth's discrete ladder; qualities are the
            # 10 binary note-quality flags).
            velocity = int(rng.choice([25, 50, 75, 100, 127]))
            qualities = rng.integers(0, 2, size=10).astype(np.int64)
            feat = {
                "audio": tf.train.Feature(
                    float_list=tf.train.FloatList(value=audio.tolist())
                ),
                "pitch": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[pitch])
                ),
                "velocity": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[velocity])
                ),
                "instrument_family": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[i % 11])
                ),
                "instrument_source": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[0])  # 0 = acoustic
                ),
                "qualities": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=qualities.tolist())
                ),
            }
            writer.write(
                tf.train.Example(
                    features=tf.train.Features(feature=feat)
                ).SerializeToString()
            )
    return path
