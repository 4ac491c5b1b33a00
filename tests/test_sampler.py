"""Full-res pitch-conditional sampling tests (driver config 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gansynth_tpu.synth import Sampler, make_sampler
from gansynth_tpu.train import create_train_state
from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

CFG = Config(
    model=ModelConfig(latent_dim=8, fmap_base=64, fmap_max=16, fmap_min=8),
    train=TrainConfig(batch_size=2),
)


@pytest.fixture(scope="module")
def state():
    return create_train_state(CFG, seed=0)


def test_full_res_sample_shapes(state):
    sampler = Sampler(CFG, state.ema_params)  # final stage: 128 x 1024
    wave, image = sampler(jax.random.key(0), [40, 60])
    assert image.shape == (2, 128, 1024, 2)
    assert wave.shape == (2, CFG.audio.audio_length)
    assert np.isfinite(np.asarray(wave)).all()


def test_sample_deterministic_per_key(state):
    sampler = Sampler(CFG, state.ema_params)
    w1, _ = sampler(jax.random.key(5), [50])
    w2, _ = sampler(jax.random.key(5), [50])
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    w3, _ = sampler(jax.random.key(6), [50])
    assert np.abs(np.asarray(w1) - np.asarray(w3)).max() > 0


def test_dp_sampler_matches_single_device(state):
    """Mesh-sharded sampling (pod serving path) == single-device sampling
    for the same key and pitches."""
    from gansynth_tpu.parallel import make_mesh
    from gansynth_tpu.synth import make_dp_sampler

    pitches = jnp.asarray(list(range(30, 78, 6)), jnp.int32)  # 8, one per dev
    single = make_sampler(CFG)
    w1, _ = single(state.ema_params, jax.random.key(3), pitches)

    mesh = make_mesh()
    dp = make_dp_sampler(CFG, mesh)
    params = jax.device_put(
        state.ema_params,
        __import__("gansynth_tpu.parallel.sharding", fromlist=["x"])
        .replicated_sharding(mesh),
    )
    w8 = dp(params, jax.random.key(3), pitches)
    assert not w8.sharding.is_fully_replicated  # batch-sharded output
    # identical math; tolerance scaled to the signal for reduction-order
    # float noise under different partitionings
    a, b = np.asarray(w1), np.asarray(w8)
    np.testing.assert_allclose(a, b, atol=2e-4 * max(np.abs(a).max(), 1.0))


def test_seeded_sampler_note_independent_of_cobatch(state):
    """make_seeded_sampler: a note's audio is a pure function of its own
    (seed, pitch) — identical no matter which notes share the batch
    (the coalescing-safety contract of the serving layer)."""
    from gansynth_tpu.synth.sampler import make_seeded_sampler

    sample = make_seeded_sampler(CFG, stage=2)
    a = sample(state.ema_params, jnp.asarray([7, 11, 13], jnp.int32),
               jnp.asarray([40, 60, 80], jnp.int32))
    b = sample(state.ema_params, jnp.asarray([99, 11, 98], jnp.int32),
               jnp.asarray([24, 60, 84], jnp.int32))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert np.abs(np.asarray(a[0]) - np.asarray(b[0])).max() > 0
    # different seed, same pitch -> different audio
    c = sample(state.ema_params, jnp.asarray([8, 11, 13], jnp.int32),
               jnp.asarray([40, 60, 80], jnp.int32))
    assert np.abs(np.asarray(a[0]) - np.asarray(c[0])).max() > 0


def test_low_stage_sampler(state):
    sample = make_sampler(CFG, stage=2)
    wave, image = sample(state.ema_params, jax.random.key(0),
                         jnp.asarray([30], jnp.int32))
    # below the final stage the image is stage-sized and the wave comes
    # from its nearest-upsampled full-res version (debug/listen path)
    assert image.shape[1:3] == CFG.model.stage_resolution(2)
    assert wave.shape == (1, CFG.audio.audio_length)
    assert np.isfinite(np.asarray(wave)).all()
