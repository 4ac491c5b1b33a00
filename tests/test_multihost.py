"""Multi-host helpers: in a single process, the host-local assembly path
must equal the direct sharded placement (SURVEY.md §7 step 5's pod
infeed, exercised without a pod)."""

import numpy as np

import jax

from gansynth_tpu.parallel import (
    batch_sharding,
    make_mesh,
    shard_host_local_batch,
)


def test_host_local_assembly_equals_device_put():
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((8, 1000)).astype(np.float32)
    pitch = np.arange(8, dtype=np.int32)

    w_g, p_g = shard_host_local_batch(mesh, wave, pitch)
    assert w_g.shape == (8, 1000) and p_g.shape == (8,)
    assert not w_g.sharding.is_fully_replicated

    w_direct = jax.device_put(wave, batch_sharding(mesh))
    np.testing.assert_array_equal(np.asarray(w_g), np.asarray(w_direct))
    np.testing.assert_array_equal(np.asarray(p_g), pitch)


def test_process_sharded_ingest_covers_batch(tmp_path):
    """Single-process check of the multi-host recipe: num_shards=P
    iterators partition the dataset without overlap (real pods pass
    jax.process_count()/process_index())."""
    import pytest

    pytest.importorskip("tensorflow")
    from gansynth_tpu.data import make_nsynth_iterator, write_synthetic_tfrecords
    from gansynth_tpu.utils.config import Config, TrainConfig

    cfg = Config(train=TrainConfig(batch_size=2))
    path = write_synthetic_tfrecords(
        str(tmp_path / "x.tfrecord"), num_examples=16,
        pitches=range(30, 70), seed=0,
    )
    seen = []
    for p in range(4):
        it = make_nsynth_iterator(
            [path], cfg, shuffle=False, repeat=False,
            num_shards=4, shard_index=p,
        )
        seen.extend(np.concatenate([b[1] for b in it]).tolist())
    single = []
    for _, b in make_nsynth_iterator([path], cfg, shuffle=False, repeat=False):
        single.extend(b.tolist())
    assert sorted(seen) == sorted(single)
