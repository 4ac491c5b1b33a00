"""One-run anchor->release schedule (DESIGN.md §4g production recipe).

Round 3 measured that the harmonic anchor is scaffolding: required while
pitch structure forms, and a distribution-quality bottleneck afterwards
(releasing it bought an 8x Fréchet recovery at zero pitch cost). These
tests pin the single-run mechanization: at
``train.pitch_consistency_release_step`` the loop switches to
``Config.released()`` (anchor weight 0, fake-batch pitch CE off) as a
compile boundary, exactly like a stage change — and the whole schedule
is a pure function of the global step, so resume is exact.
"""

import dataclasses

import numpy as np
import pytest

import jax

from gansynth_tpu.train.loop import train
from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

ANCHORED = Config(
    model=ModelConfig(latent_dim=8, fmap_base=64, fmap_max=16, fmap_min=8),
    train=TrainConfig(
        batch_size=4,
        fade_steps=3,
        stable_steps=3,
        unroll=3,               # forces chunk clamping at the boundary
        pitch_consistency_weight=5.0,
        pitch_consistency_min_stage=0,
        seed=3,
    ),
)
RELEASE = 4


def _with_release(config: Config, step: int) -> Config:
    return dataclasses.replace(
        config,
        train=dataclasses.replace(
            config.train, pitch_consistency_release_step=step
        ),
    )


def _leaves(state):
    return [
        np.asarray(x)
        for x in jax.tree.leaves(
            (state.g_params, state.d_params, state.ema_params,
             state.g_opt, state.d_opt)
        )
    ]


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(0)
    waves = 0.1 * rng.standard_normal((8, 64000)).astype(np.float32)
    pitches = rng.integers(24, 85, size=8).astype(np.int32)
    return waves, pitches


class TestReleasedConfig:
    def test_released_flips_exactly_two_fields(self):
        rel = ANCHORED.released()
        assert rel.train.pitch_consistency_weight == 0.0
        assert rel.train.d_pitch_ce_on_fake is False
        assert dataclasses.replace(
            rel.train,
            pitch_consistency_weight=ANCHORED.train.pitch_consistency_weight,
            d_pitch_ce_on_fake=ANCHORED.train.d_pitch_ce_on_fake,
        ) == ANCHORED.train
        assert rel.model == ANCHORED.model
        assert rel.audio == ANCHORED.audio


class TestReleaseValidation:
    def test_negative_release_step_is_an_error(self, dataset):
        with pytest.raises(ValueError, match="negative"):
            train(
                _with_release(ANCHORED, -1), None,
                num_steps=2, device_dataset=dataset,
            )

    def test_release_without_anchor_is_an_error(self, dataset):
        """--pitch-consistency-release with anchor weight 0 would silently
        flip d_pitch_ce_on_fake (a change to D's objective away from DS2
        parity) — must fail loudly instead."""
        cfg = dataclasses.replace(
            _with_release(ANCHORED, 2),
            train=dataclasses.replace(
                _with_release(ANCHORED, 2).train,
                pitch_consistency_weight=0.0,
            ),
        )
        with pytest.raises(ValueError, match="no anchor to release"):
            train(cfg, None, num_steps=2, device_dataset=dataset)

    def test_release_past_end_warns(self, dataset):
        """A typo'd release step (past this run's final step) must warn —
        the anchor would otherwise silently never release."""
        with pytest.warns(UserWarning, match="will NOT release"):
            train(
                _with_release(ANCHORED, 1000), None,
                num_steps=2, device_dataset=dataset,
            )


class TestReleaseSchedule:
    def test_one_run_matches_manual_two_phase(self, dataset):
        """The single-run schedule must be bitwise identical to the
        manual two-run dance it replaces (train anchored to R, then
        continue with the released config) — under an unroll that forces
        the chunk to clamp at the release boundary AND a stage crossing
        inside the run."""
        s_one = train(
            _with_release(ANCHORED, RELEASE), None,
            num_steps=8, device_dataset=dataset,
        )

        s_a = train(ANCHORED, None, num_steps=RELEASE, device_dataset=dataset)
        s_b = train(
            ANCHORED.released(), None,
            num_steps=8 - RELEASE, device_dataset=dataset, state=s_a,
        )
        assert int(s_one.step) == int(s_b.step) == 8
        for a, b in zip(_leaves(s_one), _leaves(s_b)):
            np.testing.assert_array_equal(a, b)

    def test_anchor_metric_flips_at_the_boundary(self, dataset):
        seen = []
        train(
            _with_release(ANCHORED, RELEASE), None,
            num_steps=8, device_dataset=dataset,
            on_metrics=lambda s, st, m: seen.append(
                (s, "g_pitch_consistency" in m)
            ),
        )
        assert seen and any(h for _, h in seen) and any(not h for _, h in seen)
        for step, has_anchor in seen:
            # Chunks clamp at the boundary, so a chunk ending at step <= R
            # ran entirely anchored; everything after ran released.
            assert has_anchor == (step <= RELEASE), seen

    def test_release_at_zero_equals_released_config(self, dataset):
        s0 = train(
            _with_release(ANCHORED, 0), None,
            num_steps=4, device_dataset=dataset,
        )
        sr = train(
            ANCHORED.released(), None, num_steps=4, device_dataset=dataset
        )
        for a, b in zip(_leaves(s0), _leaves(sr)):
            np.testing.assert_array_equal(a, b)

    def test_resume_lands_in_the_right_phase(self, dataset, tmp_path):
        """Interrupt exactly at the release step; the restored run must
        come back RELEASED (phase is derived from the global step, no
        extra persisted state) and match the uninterrupted run."""
        cfg = dataclasses.replace(
            _with_release(ANCHORED, RELEASE),
            train=dataclasses.replace(
                _with_release(ANCHORED, RELEASE).train,
                checkpoint_every=RELEASE, log_every=8,
            ),
        )
        s_full = train(
            cfg, None, num_steps=8, device_dataset=dataset,
            workdir=str(tmp_path / "full"),
        )
        workdir = str(tmp_path / "interrupted")
        train(cfg, None, num_steps=RELEASE, device_dataset=dataset,
              workdir=workdir)
        seen = []
        s_res = train(
            cfg, None, num_steps=4, device_dataset=dataset, workdir=workdir,
            on_metrics=lambda s, st, m: seen.append(
                "g_pitch_consistency" in m
            ),
        )
        assert not any(seen), "resumed run re-entered the anchored phase"
        for a, b in zip(_leaves(s_full), _leaves(s_res)):
            np.testing.assert_array_equal(a, b)
