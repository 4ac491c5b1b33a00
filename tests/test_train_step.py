"""Training-step tests on a toy stage (SURVEY.md §4 item 3, driver config 2):
loss finiteness, second-order GP gradients, EMA movement, fade endpoints,
seeded determinism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gansynth_tpu.train import create_train_state, make_train_step
from gansynth_tpu.train.losses import gradient_penalty, pitch_cross_entropy
from gansynth_tpu.train.schedule import ProgressiveSchedule
from gansynth_tpu.train.step import pitch_to_onehot, real_image_for_stage
from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

CFG = Config(
    model=ModelConfig(latent_dim=8, fmap_base=64, fmap_max=16, fmap_min=8),
    train=TrainConfig(batch_size=4),
)
STAGE = 1  # 4 x 32 images


@pytest.fixture(scope="module")
def state():
    return create_train_state(CFG, seed=0)


@pytest.fixture
def batch(rng):
    t = np.arange(CFG.audio.audio_length) / CFG.audio.sample_rate
    waves = np.stack(
        [np.sin(2 * np.pi * f * t) for f in (220.0, 440.0, 880.0, 1760.0)]
    ).astype(np.float32)
    waves += 0.01 * rng.standard_normal(waves.shape).astype(np.float32)
    pitch = np.array([45, 57, 69, 81], dtype=np.int32)
    return jnp.asarray(waves), jnp.asarray(pitch)


class TestHelpers:
    def test_pitch_onehot(self):
        oh = np.asarray(pitch_to_onehot(jnp.asarray([24, 84, 50]), CFG))
        assert oh.shape == (3, 61)
        assert oh[0, 0] == 1.0 and oh[1, 60] == 1.0 and oh[2, 26] == 1.0
        # out-of-range pitches clip instead of corrupting memory
        oh2 = np.asarray(pitch_to_onehot(jnp.asarray([0, 127]), CFG))
        assert oh2[0, 0] == 1.0 and oh2[1, 60] == 1.0

    def test_real_image_resolution(self, batch):
        waves, _ = batch
        img = real_image_for_stage(waves, STAGE, CFG)
        h, w = CFG.model.stage_resolution(STAGE)
        assert img.shape == (4, h, w, 2)
        full = real_image_for_stage(waves, CFG.model.num_stages - 1, CFG)
        assert full.shape == (4, 128, 1024, 2)

    def test_gradient_penalty_second_order(self, rng):
        """GP must differentiate w.r.t. critic params (grad-of-grad)."""
        w = jnp.asarray(rng.standard_normal((6, 1)).astype(np.float32))

        def critic_fn_builder(wp):
            return lambda x: ((x.reshape(x.shape[0], -1) ** 2) @ wp, None)

        real = jnp.asarray(rng.standard_normal((3, 2, 2, 1)).astype(np.float32))
        fake = jnp.asarray(rng.standard_normal((3, 2, 2, 1)).astype(np.float32))
        gp_of_w = lambda wp: gradient_penalty(
            critic_fn_builder(wp.reshape(4, 1)), real, fake, jax.random.key(0)
        )
        grad = jax.grad(gp_of_w)(jnp.ones((4,)))
        assert np.isfinite(np.asarray(grad)).all()
        assert np.abs(np.asarray(grad)).max() > 0.0

    def test_pitch_ce_matches_manual(self, rng):
        logits = jnp.asarray(rng.standard_normal((5, 61)).astype(np.float32))
        labels = jax.nn.one_hot(jnp.arange(5), 61)
        ours = float(pitch_cross_entropy(logits, labels))
        lp = np.asarray(jax.nn.log_softmax(logits))
        manual = -np.mean([lp[i, i] for i in range(5)])
        np.testing.assert_allclose(ours, manual, rtol=1e-5)


class TestTrainStep:
    def test_single_step(self, state, batch):
        step = jax.jit(make_train_step(CFG, STAGE))
        waves, pitch = batch
        new_state, metrics = step(state, waves, pitch, jnp.float32(0.5))
        for k, v in metrics.items():
            assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"
        assert int(new_state.step) == int(state.step) + 1
        assert float(metrics["gradient_penalty"]) > 0.0
        # params actually moved
        moved = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), state.g_params,
            new_state.g_params,
        )
        assert max(jax.tree.leaves(moved)) > 0.0
        # EMA moved toward new params but less than params did
        ema_delta = max(
            jax.tree.leaves(
                jax.tree.map(
                    lambda a, b: float(jnp.abs(a - b).max()),
                    state.ema_params,
                    new_state.ema_params,
                )
            )
        )
        assert 0.0 < ema_delta

    def test_determinism(self, state, batch):
        """Two runs from the same state are bitwise equal (SURVEY.md §4.3)."""
        step = jax.jit(make_train_step(CFG, STAGE))
        waves, pitch = batch
        s1, m1 = step(state, waves, pitch, jnp.float32(1.0))
        s2, m2 = step(state, waves, pitch, jnp.float32(1.0))
        l1 = jax.tree.leaves(s1, is_leaf=lambda x: hasattr(x, "dtype"))
        l2 = jax.tree.leaves(s2, is_leaf=lambda x: hasattr(x, "dtype"))
        for a, b in zip(l1, l2):
            if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key):
                a, b = jax.random.key_data(a), jax.random.key_data(b)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_unused_stage_params_frozen(self, state, batch):
        """Blocks above the active stage receive zero grads: their params
        and their EMA copies must not move (the no-surgery contract)."""
        step = jax.jit(make_train_step(CFG, STAGE))
        waves, pitch = batch
        new_state, _ = step(state, waves, pitch, jnp.float32(1.0))
        g0 = state.g_params["params"]
        g1 = new_state.g_params["params"]
        for name in (f"block_{STAGE + 1}", f"to_rgb_{STAGE + 2}"):
            for k in g0[name]:
                for p0, p1 in zip(
                    jax.tree.leaves(g0[name][k]), jax.tree.leaves(g1[name][k])
                ):
                    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        # while active-path params did move
        assert any(
            float(jnp.abs(a - b).max()) > 0
            for a, b in zip(
                jax.tree.leaves(g0[f"block_{STAGE}"]),
                jax.tree.leaves(g1[f"block_{STAGE}"]),
            )
        )

    def test_remat_matches_no_remat(self, state, batch):
        """jax.checkpoint on trunk blocks must not change the math
        (SURVEY.md §7 hard-part 3 mitigation)."""
        import dataclasses

        cfg_r = dataclasses.replace(
            CFG, model=dataclasses.replace(CFG.model, remat=True)
        )
        waves, pitch = batch
        plain = jax.jit(make_train_step(CFG, STAGE))
        remat = jax.jit(make_train_step(cfg_r, STAGE))
        _, m0 = plain(state, waves, pitch, jnp.float32(0.7))
        _, m1 = remat(state, waves, pitch, jnp.float32(0.7))
        for k in m0:
            np.testing.assert_allclose(
                np.asarray(m0[k]), np.asarray(m1[k]), rtol=1e-4,
                err_msg=f"metric {k}",
            )

    def test_two_steps_progress(self, state, batch):
        step = jax.jit(make_train_step(CFG, STAGE))
        waves, pitch = batch
        s, m0 = step(state, waves, pitch, jnp.float32(1.0))
        s, m1 = step(s, waves, pitch, jnp.float32(1.0))
        assert int(s.step) == 2
        # metrics change step to step (different RNG stream via fold_in)
        assert float(m0["d_loss"]) != float(m1["d_loss"])


class TestSchedule:
    def test_stage0_no_fade(self):
        sch = ProgressiveSchedule(num_stages=3, fade_steps=10, stable_steps=20)
        assert sch.stage_and_alpha(0) == (0, 1.0)
        assert sch.stage_and_alpha(19) == (0, 1.0)

    def test_fade_ramp_and_stabilize(self):
        sch = ProgressiveSchedule(num_stages=3, fade_steps=10, stable_steps=20)
        stage, alpha = sch.stage_and_alpha(20)
        assert stage == 1 and 0 < alpha <= 0.2
        stage, alpha = sch.stage_and_alpha(29)
        assert stage == 1 and alpha == 1.0
        stage, alpha = sch.stage_and_alpha(49)
        assert stage == 1 and alpha == 1.0
        stage, alpha = sch.stage_and_alpha(50)
        assert stage == 2 and alpha <= 0.2

    def test_past_ladder_stays_at_top(self):
        sch = ProgressiveSchedule(num_stages=3, fade_steps=10, stable_steps=20)
        assert sch.stage_and_alpha(10_000) == (2, 1.0)

    def test_boundaries_cover_total(self):
        sch = ProgressiveSchedule(num_stages=4, fade_steps=7, stable_steps=13)
        segs = list(sch.stage_boundaries())
        assert segs[0] == (0, 0, 13)
        assert segs[-1][2] == sch.total_steps()
        for (s0, a0, b0), (s1, a1, b1) in zip(segs, segs[1:]):
            assert b0 == a1 and s1 == s0 + 1

    def test_alpha_monotone_within_stage(self):
        sch = ProgressiveSchedule(num_stages=3, fade_steps=100, stable_steps=50)
        alphas = [sch.stage_and_alpha(s)[1] for s in range(50, 150)]
        assert all(b >= a for a, b in zip(alphas, alphas[1:]))
        assert alphas[-1] == 1.0
