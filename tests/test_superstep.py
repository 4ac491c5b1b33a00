"""Fused multi-step training programs (superstep / device-cached superstep)
and the per-stage progressive schedule.

The invariant under test: fusing K steps into one ``lax.scan`` program —
with or without the HBM-resident dataset — computes the SAME training
trajectory as K individually dispatched steps (same RNG stream keyed off
(state.rng, state.step), same data order), so the loop can chunk freely
around stage boundaries and resume points.
"""

import dataclasses
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gansynth_tpu.train import (
    create_train_state,
    make_cached_superstep,
    make_superstep,
    make_train_step,
)
from gansynth_tpu.train.loop import train
from gansynth_tpu.train.schedule import (
    ProgressiveSchedule,
    schedule_from_config,
)
from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

CFG = Config(
    model=ModelConfig(latent_dim=8, fmap_base=64, fmap_max=16, fmap_min=8),
    train=TrainConfig(batch_size=4),
)
STAGE = 1


def assert_states_close(s1, s2, rtol=0.0, atol=0.0):
    l1 = jax.tree.leaves(s1, is_leaf=lambda x: hasattr(x, "dtype"))
    l2 = jax.tree.leaves(s2, is_leaf=lambda x: hasattr(x, "dtype"))
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        if rtol == 0.0 and atol == 0.0:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        else:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=rtol, atol=atol
            )


@pytest.fixture(scope="module")
def chunk(request):
    rng = np.random.default_rng(7)
    k, b = 4, CFG.train.batch_size
    t = np.arange(CFG.audio.audio_length) / CFG.audio.sample_rate
    freqs = rng.uniform(110, 1500, (k, b))
    waves = np.sin(2 * np.pi * freqs[..., None] * t).astype(np.float32)
    waves += 0.01 * rng.standard_normal(waves.shape).astype(np.float32)
    pitches = rng.integers(24, 85, (k, b)).astype(np.int32)
    alphas = np.linspace(0.25, 1.0, k).astype(np.float32)
    return jnp.asarray(waves), jnp.asarray(pitches), jnp.asarray(alphas)


class TestSuperstep:
    def test_matches_sequential_steps(self, chunk):
        waves, pitches, alphas = chunk
        state0 = create_train_state(CFG, seed=0)

        step = jax.jit(make_train_step(CFG, STAGE))
        seq = state0
        per_step_metrics = []
        for i in range(waves.shape[0]):
            seq, m = step(seq, waves[i], pitches[i], alphas[i])
            per_step_metrics.append(m)

        fused = jax.jit(make_superstep(CFG, STAGE))
        out, metrics = fused(create_train_state(CFG, seed=0), waves, pitches,
                             alphas)
        assert int(out.step) == waves.shape[0]
        # Same trajectory (scan vs sequential dispatch may fuse
        # differently; allow float-assoc noise only).
        assert_states_close(seq, out, rtol=2e-5, atol=1e-6)
        # Metrics are means over the K inner steps.
        want = np.mean([float(m["d_loss"]) for m in per_step_metrics])
        np.testing.assert_allclose(float(metrics["d_loss"]), want, rtol=2e-4)
        assert float(metrics["alpha"]) == float(alphas[-1])

    def test_chunking_invariance(self, chunk):
        """K=4 in one program == 2+2 in two programs (resume-exactness of
        the fused path: RNG is keyed off state.step, not chunk shape)."""
        waves, pitches, alphas = chunk
        fused = jax.jit(make_superstep(CFG, STAGE))
        one, _ = fused(create_train_state(CFG, seed=0), waves, pitches, alphas)
        two = create_train_state(CFG, seed=0)
        two, _ = fused(two, waves[:2], pitches[:2], alphas[:2])
        two, _ = fused(two, waves[2:], pitches[2:], alphas[2:])
        assert_states_close(one, two, rtol=2e-5, atol=1e-6)


class TestCachedSuperstep:
    @pytest.fixture(scope="class")
    def dataset(self):
        rng = np.random.default_rng(3)
        n = 16
        t = np.arange(CFG.audio.audio_length) / CFG.audio.sample_rate
        freqs = rng.uniform(110, 1500, n)
        waves = np.sin(2 * np.pi * freqs[:, None] * t).astype(np.float32)
        pitches = rng.integers(24, 85, n).astype(np.int32)
        return jnp.asarray(waves), jnp.asarray(pitches)

    def test_runs_and_counts_steps(self, dataset):
        waves, pitches = dataset
        fused = jax.jit(make_cached_superstep(CFG, STAGE, waves.shape[0]))
        state = create_train_state(CFG, seed=0)
        alphas = jnp.ones(3, jnp.float32)
        state, metrics = fused(state, waves, pitches, alphas)
        assert int(state.step) == 3
        for k, v in metrics.items():
            assert np.isfinite(np.asarray(v)).all(), k

    def test_chunking_invariance(self, dataset):
        """The cached data stream is a pure function of (rng, step):
        chunking the run differently replays identical batches."""
        waves, pitches = dataset
        fused = jax.jit(make_cached_superstep(CFG, STAGE, waves.shape[0]))
        a = create_train_state(CFG, seed=0)
        a, _ = fused(a, waves, pitches, jnp.ones(4, jnp.float32))
        b = create_train_state(CFG, seed=0)
        for k in (1, 3):
            b, _ = fused(b, waves, pitches, jnp.ones(k, jnp.float32))
        assert_states_close(a, b, rtol=2e-5, atol=1e-6)


class TestFusedCritic:
    """fused_critic is a SCHEDULING choice: pair/all must compute the
    same update as the three-call baseline to float tolerance (vmap over
    the stacked sub-batches keeps minibatch-stddev groups intact)."""

    @pytest.mark.parametrize("mode", ["pair", "all"])
    def test_equivalent_to_baseline(self, mode, chunk):
        waves, pitches, alphas = chunk
        state = create_train_state(CFG, seed=0)
        cfg_fused = dataclasses.replace(
            CFG, train=dataclasses.replace(CFG.train, fused_critic=mode)
        )
        base_state, base_m = jax.jit(make_train_step(CFG, STAGE))(
            state, waves[0], pitches[0], jnp.float32(1.0)
        )
        fused_state, fused_m = jax.jit(make_train_step(cfg_fused, STAGE))(
            state, waves[0], pitches[0], jnp.float32(1.0)
        )
        for k in base_m:
            np.testing.assert_allclose(
                np.asarray(base_m[k]), np.asarray(fused_m[k]),
                rtol=2e-4, atol=1e-5, err_msg=f"{mode}: metric {k}",
            )
        assert_states_close(base_state, fused_state, rtol=2e-4, atol=1e-6)

    def test_unknown_mode_rejected(self):
        cfg = dataclasses.replace(
            CFG, train=dataclasses.replace(CFG.train, fused_critic="bogus")
        )
        with pytest.raises(ValueError, match="fused_critic"):
            make_train_step(cfg, STAGE)


class TestCachedStream:
    """The two stateless sampling laws of the HBM-resident data stream."""

    def test_shuffle_is_epoch_permutation(self):
        from gansynth_tpu.train import cached_batch_indices

        rng = jax.random.key(0)
        n, batch = 16, 8
        idx = np.concatenate([
            np.asarray(cached_batch_indices(rng, jnp.int32(s), batch, n))
            for s in range(6)  # 3 epochs
        ])
        for e in range(3):
            epoch = idx[e * n:(e + 1) * n]
            assert sorted(epoch) == list(range(n)), (
                f"epoch {e} is not a permutation: {epoch}"
            )
        # epochs reshuffle (astronomically unlikely to collide)
        assert not np.array_equal(idx[:n], idx[n:2 * n])

    def test_shuffle_epoch_boundary_crossing(self):
        """A batch that straddles the epoch boundary takes the tail of one
        permutation and the head of the next."""
        from gansynth_tpu.train import cached_batch_indices

        rng = jax.random.key(1)
        n, batch = 8, 5
        idx = np.concatenate([
            np.asarray(cached_batch_indices(rng, jnp.int32(s), batch, n))
            for s in range(8)  # 40 positions = 5 epochs
        ])
        for e in range(5):
            assert sorted(idx[e * n:(e + 1) * n]) == list(range(n))

    def test_replacement_law_differs_and_is_stateless(self):
        from gansynth_tpu.train import cached_batch_indices

        rng = jax.random.key(0)
        a = np.asarray(
            cached_batch_indices(rng, jnp.int32(3), 8, 16, "replacement")
        )
        b = np.asarray(
            cached_batch_indices(rng, jnp.int32(3), 8, 16, "replacement")
        )
        np.testing.assert_array_equal(a, b)  # pure in (rng, step)
        assert a.min() >= 0 and a.max() < 16

    def test_shuffle_requires_batch_le_dataset(self):
        cfg = dataclasses.replace(
            CFG, train=dataclasses.replace(CFG.train, batch_size=32)
        )
        with pytest.raises(ValueError, match="shuffle"):
            make_cached_superstep(cfg, STAGE, 16)

    def test_loop_device_dataset_with_per_stage_batches(self):
        """The cached superstep honors stage_batch_sizes: one compile per
        stage, each sampling its own batch size, across a live stage
        boundary."""
        rng = np.random.default_rng(5)
        n = 12
        waves = 0.1 * rng.standard_normal((n, CFG.audio.audio_length))
        pitches = rng.integers(24, 85, n)
        cfg = dataclasses.replace(
            CFG,
            train=dataclasses.replace(
                CFG.train,
                batch_size=4,
                stage_batch_sizes=(8, 2, 2, 2, 2, 2, 2),
                fade_steps=2,
                stable_steps=2,
                unroll=2,
            ),
        )
        state = train(
            cfg, None, num_steps=5,
            device_dataset=(waves.astype(np.float32),
                            pitches.astype(np.int32)),
        )
        assert int(state.step) == 5  # stage 0 (2 steps) + stage 1 (3)


class TestDPitchCEOnFake:
    def test_flag_adds_fake_ce_term(self, chunk):
        waves, pitches, alphas = chunk
        state = create_train_state(CFG, seed=0)
        cfg_off = dataclasses.replace(
            CFG, train=dataclasses.replace(CFG.train, d_pitch_ce_on_fake=False)
        )
        _, m_on = jax.jit(make_train_step(CFG, STAGE))(
            state, waves[0], pitches[0], jnp.float32(1.0)
        )
        _, m_off = jax.jit(make_train_step(cfg_off, STAGE))(
            state, waves[0], pitches[0], jnp.float32(1.0)
        )
        # Identical forward pass and RNG stream: the d_loss difference is
        # exactly the weighted fake-batch CE (SURVEY.md DS2).
        want = CFG.train.aux_pitch_weight * float(m_on["d_pitch_ce_fake"])
        got = float(m_on["d_loss"]) - float(m_off["d_loss"])
        np.testing.assert_allclose(got, want, rtol=1e-4)
        assert float(m_on["d_pitch_ce_fake"]) > 0.0


class TestPerStageSchedule:
    def test_tuple_schedule_boundaries(self):
        sch = ProgressiveSchedule(
            num_stages=3, fade_steps=(0, 10, 20), stable_steps=(5, 15, 25)
        )
        assert list(sch.stage_boundaries()) == [
            (0, 0, 5), (1, 5, 30), (2, 30, 75)
        ]
        assert sch.total_steps() == 75
        assert sch.stage_and_alpha(0) == (0, 1.0)
        stage, alpha = sch.stage_and_alpha(5)
        assert stage == 1 and alpha == pytest.approx(0.1)
        assert sch.stage_and_alpha(15) == (1, 1.0)
        stage, alpha = sch.stage_and_alpha(30)
        assert stage == 2 and alpha == pytest.approx(1 / 20)
        assert sch.stage_and_alpha(10_000) == (2, 1.0)

    def test_tuple_matches_scalar(self):
        scalar = ProgressiveSchedule(num_stages=3, fade_steps=10,
                                     stable_steps=20)
        tup = ProgressiveSchedule(
            num_stages=3, fade_steps=(10, 10, 10), stable_steps=(20, 20, 20)
        )
        for s in range(0, 100, 3):
            assert scalar.stage_and_alpha(s) == tup.stage_and_alpha(s)

    def test_steps_until_stage_change(self):
        sch = ProgressiveSchedule(num_stages=3, fade_steps=10, stable_steps=20)
        assert sch.steps_until_stage_change(0) == 20
        assert sch.steps_until_stage_change(19) == 1
        assert sch.steps_until_stage_change(20) == 30
        assert sch.steps_until_stage_change(10_000) > 10**9

    def test_wrong_length_raises(self):
        sch = ProgressiveSchedule(num_stages=3, fade_steps=(1, 2),
                                  stable_steps=5)
        with pytest.raises(ValueError):
            sch.total_steps()

    def test_schedule_from_config(self):
        cfg = Config(train=TrainConfig(
            fade_steps=7, stable_steps=9,
            stage_fade_steps=(0, 1, 2, 3, 4, 5, 6),
        ))
        sch = schedule_from_config(cfg)
        assert sch.fade(2) == 2 and sch.stable(2) == 9
        cfg2 = Config(train=TrainConfig(fade_steps=7, stable_steps=9))
        sch2 = schedule_from_config(cfg2)
        assert sch2.fade(3) == 7 and sch2.stable(0) == 9

    def test_config_overrides_tuples(self):
        cfg = Config().with_overrides(
            {"train": {"stage_fade_steps": [1, 2, 3, 4, 5, 6, 7],
                       "unroll": 8}}
        )
        assert cfg.train.stage_fade_steps == (1, 2, 3, 4, 5, 6, 7)
        assert cfg.train.unroll == 8


class TestLoopUnroll:
    def _iter(self, batches):
        return itertools.cycle(batches)

    @pytest.fixture(scope="class")
    def batches(self):
        rng = np.random.default_rng(11)
        t = np.arange(CFG.audio.audio_length) / CFG.audio.sample_rate
        out = []
        for _ in range(6):
            freqs = rng.uniform(110, 1500, CFG.train.batch_size)
            w = np.sin(2 * np.pi * freqs[:, None] * t).astype(np.float32)
            p = rng.integers(24, 85, CFG.train.batch_size).astype(np.int32)
            out.append((w, p))
        return out

    def test_unrolled_loop_matches_single_steps(self, batches):
        base = dataclasses.replace(
            CFG,
            train=dataclasses.replace(CFG.train, fade_steps=2, stable_steps=2),
        )
        cfg_u = dataclasses.replace(
            base, train=dataclasses.replace(base.train, unroll=3)
        )
        s1 = train(base, self._iter(batches), num_steps=6,
                   state=create_train_state(base, seed=0))
        s2 = train(cfg_u, self._iter(batches), num_steps=6,
                   state=create_train_state(base, seed=0))
        assert int(s1.step) == int(s2.step) == 6
        assert_states_close(s1, s2, rtol=2e-5, atol=1e-6)

    def test_unroll_respects_stage_boundaries(self, batches):
        """Chunks must clip at stage changes: with unroll=4 and a boundary
        at step 2, stages seen per chunk stay uniform."""
        cfg = dataclasses.replace(
            CFG,
            train=dataclasses.replace(
                CFG.train, fade_steps=2, stable_steps=2, unroll=4
            ),
        )
        seen = []
        train(cfg, self._iter(batches), num_steps=6,
              state=create_train_state(cfg, seed=0),
              on_metrics=lambda step, stage, m: seen.append((step, stage)))
        # boundary at step 2 (stage0 stable=2) then stage1 fade 2 + stable 2
        assert seen == [(2, 0), (6, 1)]

    def test_loop_device_dataset(self, batches):
        cfg = dataclasses.replace(
            CFG,
            train=dataclasses.replace(
                CFG.train, fade_steps=2, stable_steps=2, unroll=3
            ),
        )
        waves = np.concatenate([b[0] for b in batches])
        pitches = np.concatenate([b[1] for b in batches])
        state = train(cfg, None, num_steps=6,
                      state=create_train_state(cfg, seed=0),
                      device_dataset=(waves, pitches))
        assert int(state.step) == 6

    def test_loop_requires_some_data(self):
        with pytest.raises(ValueError):
            train(CFG, None, num_steps=1,
                  state=create_train_state(CFG, seed=0))
