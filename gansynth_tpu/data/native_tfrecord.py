"""ctypes wrapper over the native (C++) TFRecord reader.

A TensorFlow-free ingest path: the C++ library handles record framing,
masked-CRC32C verification, and Example-proto field extraction; this
module adds the D2/D3 semantics (pitch/acoustic filtering, shuffle-buffer,
repeat, batching) in numpy. The library is compiled on first use with the
system g++ and cached next to the source (pybind11 is unavailable in this
image; the C ABI + ctypes keeps the boundary dependency-free).

``make_native_iterator`` is a drop-in for
``gansynth_tpu.data.nsynth.make_nsynth_iterator`` — equivalence is tested
against the tf.data pipeline.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from gansynth_tpu.utils.config import Config


class NSynthExample(NamedTuple):
    """One decoded NSynth example — the full D1 schema (SURVEY.md §2.1).

    Absent Int64List scalars read -1; ``qualities`` is the (possibly
    empty) int64 vector as stored."""

    audio: np.ndarray            # float32 [<= audio_length]
    pitch: int
    velocity: int
    instrument_family: int
    instrument_source: int
    qualities: np.ndarray        # int64 [<= 10]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_SRC = os.path.join(_NATIVE_DIR, "tfrecord_reader.cc")
_LIB = os.path.join(_NATIVE_DIR, "libtfrecord.so")
_LOCK = threading.Lock()
_CDLL = None


class NativeTFRecordError(RuntimeError):
    pass


def _load_library() -> ctypes.CDLL:
    global _CDLL
    with _LOCK:
        if _CDLL is not None:
            return _CDLL
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC]
            proc = subprocess.run(cmd, capture_output=True, text=True)
            if proc.returncode != 0:
                raise NativeTFRecordError(
                    f"failed to build native reader: {proc.stderr}"
                )
        lib = ctypes.CDLL(_LIB)
        lib.tfr_open.restype = ctypes.c_void_p
        lib.tfr_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.tfr_next.restype = ctypes.c_int
        lib.tfr_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int64),  # scalars[4]
            ctypes.POINTER(ctypes.c_int64),  # qualities
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.tfr_error.restype = ctypes.c_char_p
        lib.tfr_error.argtypes = [ctypes.c_void_p]
        lib.tfr_close.argtypes = [ctypes.c_void_p]
        _CDLL = lib
        return lib


def read_examples(
    path: str,
    *,
    audio_length: int = 64000,
    verify_crc: bool = True,
    max_qualities: int = 10,
) -> Iterator[NSynthExample]:
    """Yield :class:`NSynthExample` (the full D1 schema) from one TFRecord
    file. Raises NativeTFRecordError on corruption."""
    lib = _load_library()
    handle = lib.tfr_open(path.encode(), 1 if verify_crc else 0)
    if not handle:
        raise FileNotFoundError(path)
    audio = np.empty(audio_length, np.float32)
    audio_ptr = audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    n = ctypes.c_int()
    # Slot order is the C ABI contract (tfrecord_reader.cc tfr_next):
    # pitch, velocity, instrument_family, instrument_source.
    scalars = (ctypes.c_int64 * 4)()
    qual = np.empty(max_qualities, np.int64)
    qual_ptr = qual.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    qual_n = ctypes.c_int()
    try:
        while True:
            rc = lib.tfr_next(
                handle, audio_ptr, audio_length, ctypes.byref(n),
                scalars, qual_ptr, max_qualities, ctypes.byref(qual_n),
            )
            if rc == 0:
                return
            if rc < 0:
                raise NativeTFRecordError(
                    f"{path}: {lib.tfr_error(handle).decode()}"
                )
            yield NSynthExample(
                audio=audio[: n.value].copy(),
                pitch=int(scalars[0]),
                velocity=int(scalars[1]),
                instrument_family=int(scalars[2]),
                instrument_source=int(scalars[3]),
                qualities=qual[: qual_n.value].copy(),
            )
    finally:
        lib.tfr_close(handle)


def make_native_iterator(
    files: Sequence[str],
    config: Config,
    *,
    batch_size: Optional[int] = None,
    shuffle: bool = True,
    repeat: bool = True,
    acoustic_only: bool = True,
    families: Optional[Sequence[int]] = None,
    shuffle_buffer: int = 4096,
    seed: int = 0,
    num_shards: int = 1,
    shard_index: int = 0,
    skip_batches: int = 0,
    drop_remainder: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """TensorFlow-free D1–D3 pipeline: yields (wave [B, T] f32, pitch [B]
    i32) batches with the same filtering contract as the tf.data path.
    ``families`` restricts to those ``instrument_family`` ids (the other
    half of the paper's acoustic-subset key, next to instrument_source).

    ``skip_batches`` replays the (seed-deterministic) stream past that
    many batches before yielding — the data-iterator resume contract
    (SURVEY.md §5): position state == batch count."""
    batch_size = batch_size or config.train.batch_size
    audio_len = config.audio.audio_length
    lo, hi = config.model.pitch_min, config.model.pitch_max
    family_set = None if families is None else {int(f) for f in families}
    rng = np.random.default_rng(seed)

    def example_stream():
        position = 0
        while True:
            for path in files:
                for ex in read_examples(path, audio_length=audio_len):
                    idx = position
                    position += 1
                    if num_shards > 1 and idx % num_shards != shard_index:
                        continue
                    if not (lo <= ex.pitch <= hi):
                        continue
                    if acoustic_only and ex.instrument_source != 0:
                        continue
                    if (
                        family_set is not None
                        and ex.instrument_family not in family_set
                    ):
                        continue
                    audio = ex.audio
                    if audio.size < audio_len:
                        audio = np.pad(audio, (0, audio_len - audio.size))
                    yield audio, ex.pitch
            if not repeat:
                return

    stream = example_stream()
    buffer = []
    if shuffle:
        for item in stream:
            buffer.append(item)
            if len(buffer) >= shuffle_buffer:
                break

    waves, pitches = [], []
    while True:
        if shuffle:
            if not buffer:
                break
            j = int(rng.integers(len(buffer)))
            item = buffer[j]
            nxt = next(stream, None)
            if nxt is not None:
                buffer[j] = nxt
            else:
                buffer[j] = buffer[-1]
                buffer.pop()
        else:
            item = next(stream, None)
            if item is None:
                break
        waves.append(item[0])
        pitches.append(item[1])
        if len(waves) == batch_size:
            if skip_batches > 0:
                # Replay without materializing: the shuffle RNG and buffer
                # march through the identical state, the numpy stacking of
                # skipped batches is elided.
                skip_batches -= 1
            else:
                yield (
                    np.stack(waves).astype(np.float32),
                    np.asarray(pitches, np.int32),
                )
            waves, pitches = [], []
    if waves and not drop_remainder and skip_batches <= 0:
        # Final partial batch (one-shot decodes, e.g. the --device-cache
        # fill) — same contract as tf.data's drop_remainder=False.
        yield (
            np.stack(waves).astype(np.float32),
            np.asarray(pitches, np.int32),
        )
