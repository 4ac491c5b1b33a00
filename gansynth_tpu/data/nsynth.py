"""NSynth TFRecord ingest (SURVEY.md §2.1, D1–D3).

Host-side tf.data pipeline: parse -> filter (acoustic subset, pitch range)
-> shuffle -> repeat -> batch -> prefetch, yielding numpy (waveform,
pitch) batches. ALL spectral math happens on device inside the jitted
train step (SURVEY.md §2.9's boundary: "all math moves on-device"); the
host only decodes bytes. TF is imported lazily so the rest of the
framework has no TF dependency.

``prefetch_to_mesh`` overlaps host decode with device compute by keeping a
small queue of batches already transferred (sharded) onto the mesh —
the double-buffered infeed from SURVEY.md §7 step 5.
"""

from __future__ import annotations

import collections
import itertools
from typing import Iterable, Iterator, Optional, Sequence, Tuple

import jax
import numpy as np

from gansynth_tpu.utils.config import Config

# The NSynth example schema (fields the reference family consumes).
NSYNTH_FEATURES = {
    "audio": ("float32", 64000),
    "pitch": ("int64", 1),
    "velocity": ("int64", 1),
    "instrument_family": ("int64", 1),
    "instrument_source": ("int64", 1),
    "qualities": ("int64", 10),
}


def _feature_spec(audio_len: int):
    """tf.io parse spec for the FULL NSynth schema (D1): every field the
    reference family's parser declares, with defaults so files that omit
    the metadata fields (e.g. minimal fixtures) still parse."""
    import tensorflow as tf

    return {
        "audio": tf.io.FixedLenFeature([audio_len], tf.float32),
        "pitch": tf.io.FixedLenFeature([], tf.int64),
        "velocity": tf.io.FixedLenFeature([], tf.int64, -1),
        "instrument_family": tf.io.FixedLenFeature([], tf.int64, -1),
        "instrument_source": tf.io.FixedLenFeature([], tf.int64, 0),
        "qualities": tf.io.FixedLenSequenceFeature(
            [], tf.int64, allow_missing=True
        ),
    }


def _make_tf_dataset(
    files: Sequence[str],
    config: Config,
    *,
    batch_size: int,
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
):
    import tensorflow as tf

    audio_len = config.audio.audio_length
    spec = _feature_spec(audio_len)

    ds = tf.data.TFRecordDataset(list(files), num_parallel_reads=tf.data.AUTOTUNE)
    if num_shards > 1:
        ds = ds.shard(num_shards, shard_index)
    ds = ds.map(
        lambda raw: tf.io.parse_single_example(raw, spec),
        num_parallel_calls=tf.data.AUTOTUNE,
    )
    lo, hi = config.model.pitch_min, config.model.pitch_max
    ds = ds.filter(
        lambda ex: tf.logical_and(ex["pitch"] >= lo, ex["pitch"] <= hi)
    )
    if acoustic_only:
        # NSynth instrument_source: 0 = acoustic, 1 = electronic, 2 = synthetic.
        ds = ds.filter(lambda ex: tf.equal(ex["instrument_source"], 0))
    if families is not None:
        # instrument_family filter — the other half of the paper's
        # acoustic-subset key (SURVEY.md §2.1 D1/D2).
        fam = tf.constant(sorted({int(f) for f in families}), tf.int64)
        ds = ds.filter(
            lambda ex: tf.reduce_any(tf.equal(ex["instrument_family"], fam))
        )
    ds = ds.map(
        lambda ex: (ex["audio"], tf.cast(ex["pitch"], tf.int32)),
        num_parallel_calls=tf.data.AUTOTUNE,
    )
    if shuffle:
        ds = ds.shuffle(shuffle_buffer, seed=seed, reshuffle_each_iteration=True)
    if repeat:
        ds = ds.repeat()
    # drop_remainder=True is the training contract (static shapes under
    # jit); one-shot full-dataset decodes (the --device-cache fill) pass
    # False so the tail examples are not silently lost.
    ds = ds.batch(batch_size, drop_remainder=drop_remainder)
    if skip_batches:
        # Data-iterator resume (SURVEY.md §5 checkpoint row): the pipeline
        # is deterministic in `seed`, so position state == batch count;
        # skipping replays the stream to exactly where a checkpointed run
        # stopped (the skip runs in tf.data's C++ threadpool, no numpy
        # conversion of the skipped batches).
        ds = ds.skip(skip_batches)
    return ds.prefetch(tf.data.AUTOTUNE)


def make_nsynth_iterator(
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
    """Yields numpy (wave [B, 64000] f32, pitch [B] i32) batches.
    ``families`` restricts to those ``instrument_family`` ids.

    ``skip_batches`` positions the (seed-deterministic) stream past that
    many batches — the data-iterator resume contract (SURVEY.md §5)."""
    ds = _make_tf_dataset(
        files,
        config,
        batch_size=batch_size or config.train.batch_size,
        shuffle=shuffle,
        repeat=repeat,
        acoustic_only=acoustic_only,
        families=families,
        shuffle_buffer=shuffle_buffer,
        seed=seed,
        num_shards=num_shards,
        shard_index=shard_index,
        skip_batches=skip_batches,
        drop_remainder=drop_remainder,
    )
    for wave, pitch in ds.as_numpy_iterator():
        yield wave, pitch


def make_nsynth_example_iterator(
    files: Sequence[str], config: Config
) -> Iterator[dict]:
    """Unbatched, unfiltered full-schema stream: yields one dict per
    example with every D1 field (audio, pitch, velocity,
    instrument_family, instrument_source, qualities) as numpy values —
    the tf.data twin of ``native_tfrecord.read_examples`` for schema-level
    tooling and the reader byte-equivalence tests."""
    import tensorflow as tf

    spec = _feature_spec(config.audio.audio_length)
    ds = tf.data.TFRecordDataset(list(files))
    ds = ds.map(lambda raw: tf.io.parse_single_example(raw, spec))
    yield from ds.as_numpy_iterator()


def prefetch_to_mesh(
    it: Iterable[Tuple[np.ndarray, np.ndarray]],
    mesh,
    *,
    depth: int = 2,
) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Double-buffered device infeed: keep ``depth`` batches already
    device_put with the mesh's batch sharding while the step consumes the
    head of the queue."""
    from gansynth_tpu.parallel.sharding import (
        batch_sharding,
        shard_host_local_batch,
    )

    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        # Multi-host: each process contributes its local slice of the
        # global batch.
        def put(wave, pitch):
            return shard_host_local_batch(mesh, wave, pitch)
    else:
        def put(wave, pitch):
            return jax.device_put(wave, sharding), jax.device_put(pitch, sharding)

    queue = collections.deque()
    it = iter(it)
    for wave, pitch in itertools.islice(it, depth):
        queue.append(put(wave, pitch))
    while queue:
        head = queue.popleft()
        nxt = next(it, None)
        if nxt is not None:
            queue.append(put(nxt[0], nxt[1]))
        yield head
