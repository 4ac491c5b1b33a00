"""Distributed tests without a cluster (SURVEY.md §4 item 4): the
data-parallel step on an 8-device virtual CPU mesh must equal the
single-device step on the same global batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gansynth_tpu.parallel import (
    jit_train_step_for_mesh,
    make_mesh,
    shard_train_inputs,
)
from gansynth_tpu.train import create_train_state, make_train_step
from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

CFG = Config(
    model=ModelConfig(latent_dim=8, fmap_base=64, fmap_max=16, fmap_min=8),
    train=TrainConfig(batch_size=8),
)
STAGE = 1


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(7)
    t = np.arange(CFG.audio.audio_length) / CFG.audio.sample_rate
    freqs = 220.0 * 2 ** (np.arange(8) / 4)
    waves = np.stack([np.sin(2 * np.pi * f * t) for f in freqs]).astype(np.float32)
    waves += 0.01 * rng.standard_normal(waves.shape).astype(np.float32)
    pitch = np.arange(40, 48, dtype=np.int32)
    return jnp.asarray(waves), jnp.asarray(pitch)


def leaves_as_numpy(tree):
    out = []
    for leaf in jax.tree.leaves(tree, is_leaf=lambda x: hasattr(x, "dtype")):
        if jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            leaf = jax.random.key_data(leaf)
        out.append(np.asarray(leaf))
    return out


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices


def test_dp_step_equals_single_device(batch):
    """The GSPMD-partitioned step must reproduce the single-device step on
    the same global batch to float tolerance (psum correctness)."""
    waves, pitch = batch
    step_fn = make_train_step(CFG, STAGE)

    state1 = create_train_state(CFG, seed=0)
    single = jax.jit(step_fn)
    s1, m1 = single(state1, waves, pitch, jnp.float32(0.7))

    mesh = make_mesh()
    state8 = create_train_state(CFG, seed=0)
    dp = jit_train_step_for_mesh(step_fn, mesh)
    st, w, p = shard_train_inputs(mesh, state8, waves, pitch)
    s8, m8 = dp(st, w, p, jnp.float32(0.7))

    for k in m1:
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(m8[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"metric {k}",
        )
    for a, b in zip(leaves_as_numpy(s1), leaves_as_numpy(s8)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_dp_two_meshes_agree(batch):
    """2-device and 8-device shardings agree (device-count independence)."""
    waves, pitch = batch
    step_fn = make_train_step(CFG, STAGE)

    results = []
    for n in (2, 8):
        mesh = make_mesh(jax.devices()[:n])
        state = create_train_state(CFG, seed=3)
        dp = jit_train_step_for_mesh(step_fn, mesh)
        st, w, p = shard_train_inputs(mesh, state, waves, pitch)
        s, m = dp(st, w, p, jnp.float32(1.0))
        results.append((leaves_as_numpy(s), m))
    for a, b in zip(results[0][0], results[1][0]):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_multislice_mesh_equals_single_device(batch):
    """A 2-slice x 4-chip (replica, data) mesh — the DCN scale-out
    topology — runs the unchanged step and matches single-device on the
    same global batch (hierarchical all-reduce correctness)."""
    from gansynth_tpu.parallel import make_multislice_mesh

    waves, pitch = batch
    step_fn = make_train_step(CFG, STAGE)

    s1, m1 = jax.jit(step_fn)(
        create_train_state(CFG, seed=0), waves, pitch, jnp.float32(0.7)
    )

    mesh = make_multislice_mesh(2)
    assert mesh.axis_names == ("replica", "data")
    assert mesh.devices.shape == (2, 4)
    dp = jit_train_step_for_mesh(step_fn, mesh)
    st, w, p = shard_train_inputs(mesh, create_train_state(CFG, seed=0),
                                  waves, pitch)
    assert len(w.sharding.device_set) == 8  # batch spans both axes
    s8, m8 = dp(st, w, p, jnp.float32(0.7))

    for k in m1:
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(m8[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"metric {k}",
        )
    for a, b in zip(leaves_as_numpy(s1), leaves_as_numpy(s8)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_per_replica_mbstd_shards_and_differs(batch):
    """--mbstd per-replica under the 8-device mesh: runs, stays
    DP==single-device for ITS OWN semantics (per-replica stats are a pure
    function of the global batch), and differs from global-batch stats."""
    import dataclasses

    waves, pitch = batch
    cfg_rep = dataclasses.replace(
        CFG, model=dataclasses.replace(CFG.model, mbstd_replicas=8)
    )
    mesh = make_mesh()

    # sharded per-replica step
    dp = jit_train_step_for_mesh(make_train_step(cfg_rep, STAGE), mesh)
    st, w, p = shard_train_inputs(
        mesh, create_train_state(cfg_rep, seed=0), waves, pitch
    )
    s_rep, m_rep = dp(st, w, p, jnp.float32(0.7))

    # single-device run of the same per-replica semantics
    single = jax.jit(make_train_step(cfg_rep, STAGE))
    s_one, m_one = single(
        create_train_state(cfg_rep, seed=0), waves, pitch, jnp.float32(0.7)
    )
    for k in m_one:
        np.testing.assert_allclose(
            np.asarray(m_one[k]), np.asarray(m_rep[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"metric {k}",
        )

    # and it is a genuinely different estimator than global-batch stats
    m_glob = jax.jit(make_train_step(CFG, STAGE))(
        create_train_state(CFG, seed=0), waves, pitch, jnp.float32(0.7)
    )[1]
    assert float(m_glob["d_loss"]) != float(m_one["d_loss"])


def test_indivisible_batch_rejected(batch):
    waves, pitch = batch
    mesh = make_mesh()
    state = create_train_state(CFG, seed=0)
    with pytest.raises(ValueError):
        shard_train_inputs(mesh, state, waves[:6], pitch[:6])


def test_output_shardings(batch):
    """The updated state comes back replicated (ready for the next step)."""
    waves, pitch = batch
    mesh = make_mesh()
    step_fn = make_train_step(CFG, STAGE)
    dp = jit_train_step_for_mesh(step_fn, mesh)
    st, w, p = shard_train_inputs(mesh, state := create_train_state(CFG, 0), waves, pitch)
    s8, _ = dp(st, w, p, jnp.float32(1.0))
    leaf = jax.tree.leaves(s8.g_params)[0]
    assert leaf.sharding.is_fully_replicated


class TestDeviceCacheOnMesh:
    """The HBM-resident cached stream over a mesh (VERDICT r3 item 2):
    same batch CONTENT as the single-device cached stream (index math is
    replicated), same step math to DP float tolerance — for both cache
    layouts."""

    @pytest.fixture(scope="class")
    def dataset(self):
        rng = np.random.default_rng(11)
        waves = 0.1 * rng.standard_normal((16, CFG.audio.audio_length))
        pitches = rng.integers(24, 85, size=16)
        return waves.astype(np.float32), pitches.astype(np.int32)

    def _run(self, dataset, mesh, layout):
        import dataclasses

        from gansynth_tpu.train.loop import train

        cfg = dataclasses.replace(
            CFG,
            train=dataclasses.replace(
                CFG.train, unroll=3, device_cache_layout=layout,
                fade_steps=4, stable_steps=4,
            ),
        )
        return train(
            cfg, None, num_steps=6, device_dataset=dataset, mesh=mesh
        )

    @pytest.mark.parametrize("layout", ["replicate", "shard"])
    def test_dp_cached_equals_single_device(self, dataset, layout):
        s1 = self._run(dataset, None, layout)
        s8 = self._run(dataset, make_mesh(), layout)
        assert int(s1.step) == int(s8.step) == 6
        for a, b in zip(leaves_as_numpy(s1), leaves_as_numpy(s8)):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)

    def test_sharded_cache_is_actually_sharded(self, dataset):
        """layout='shard' must place the example axis across devices —
        per-device HBM holds N/n examples, not N."""
        from gansynth_tpu.parallel import cache_sharding

        mesh = make_mesh()
        waves = jax.device_put(
            jnp.asarray(dataset[0]), cache_sharding(mesh, "shard")
        )
        assert not waves.sharding.is_fully_replicated
        shard_shapes = {s.data.shape for s in waves.addressable_shards}
        assert shard_shapes == {(2, CFG.audio.audio_length)}  # 16/8

    def test_indivisible_sharded_cache_rejected(self, dataset):
        from gansynth_tpu.train.loop import train
        import dataclasses

        cfg = dataclasses.replace(
            CFG,
            train=dataclasses.replace(
                CFG.train, device_cache_layout="shard"
            ),
        )
        with pytest.raises(ValueError, match="divisible"):
            train(
                cfg, None, num_steps=1,
                device_dataset=(dataset[0][:15], dataset[1][:15]),
                mesh=make_mesh(),
            )
