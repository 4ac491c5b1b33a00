"""Evaluation metric tests: pitch detection on known signals, end-to-end
roundtrip pitch fidelity (driver config 1's 'energy at the conditioned
pitch' check), and the sampler-evaluation harness."""

import numpy as np
import pytest

import jax.numpy as jnp

from gansynth_tpu.data.fixtures import midi_to_hz, synthesize_note
from gansynth_tpu.evaluation import (
    detect_midi_pitch,
    evaluate_sampler,
    log_spectral_distance,
    pitch_accuracy,
)
from gansynth_tpu.ops import image_to_wave, wave_to_image
from gansynth_tpu.utils.config import AudioConfig


class TestPitchDetection:
    @pytest.mark.parametrize("midi", [30, 48, 60, 72, 84])
    def test_detects_fixture_notes(self, midi):
        wave = synthesize_note(midi)
        detected = detect_midi_pitch(wave)
        assert abs(detected - midi) < 0.5, (midi, detected)

    @pytest.mark.parametrize("midi", [24, 37, 55, 84])
    def test_detects_diversified_fixture_notes(self, midi):
        """The fidelity metric must hold across the full conditioning range
        and the fixture writer's timbre-diversity envelope (harmonics 2-6,
        decay 0.8-2.2) — otherwise training-eval numbers are detector
        noise."""
        for nh, dec, seed in [(2, 0.9, 1), (5, 2.1, 2), (6, 1.4, 3)]:
            wave = synthesize_note(midi, num_harmonics=nh, decay=dec,
                                   seed=seed)
            detected = detect_midi_pitch(wave)
            assert abs(detected - midi) < 0.5, (midi, nh, dec, detected)

    @pytest.mark.parametrize("midi", [30, 48, 60, 72, 84])
    def test_acf_detector_agrees(self, midi):
        """The autocorrelation cross-check detector lands on the same
        fundamental as the harmonic-sum detector on known notes."""
        from gansynth_tpu.evaluation import detect_midi_pitch_acf

        wave = synthesize_note(midi)
        assert abs(detect_midi_pitch_acf(wave) - midi) < 0.5
        # pure tone too (no harmonics for either detector to lean on)
        t = np.arange(64000) / 16000.0
        tone = np.sin(2 * np.pi * midi_to_hz(midi) * t).astype(np.float32)
        assert abs(detect_midi_pitch_acf(tone) - midi) < 0.5

    def test_pitch_accuracy_batch(self):
        pitches = [40, 52, 64, 76]
        waves = np.stack([synthesize_note(p) for p in pitches])
        m = pitch_accuracy(waves, pitches)
        assert m["pitch_accuracy"] == 1.0
        assert m["pitch_mae_semitones"] < 0.5
        assert m["pitch_accuracy_acf"] == 1.0
        assert m["pitch_accuracy_either"] == 1.0
        assert m["pitch_mae_either"] <= m["pitch_mae_semitones"] + 1e-12
        # wrong labels are caught by every detector
        m_bad = pitch_accuracy(waves, [p + 7 for p in pitches])
        assert m_bad["pitch_accuracy"] == 0.0
        assert m_bad["pitch_accuracy_either"] == 0.0


class TestSpectralRoundtripFidelity:
    def test_roundtrip_preserves_conditioned_pitch(self):
        """The full mel-IF image roundtrip must preserve pitch across the
        register (config 1: 'audio reconstructions within tolerance')."""
        cfg = AudioConfig()
        pitches = [36, 48, 60, 72, 84]
        waves = np.stack([synthesize_note(p) for p in pitches])
        img = wave_to_image(jnp.asarray(waves), cfg)
        recon = np.asarray(image_to_wave(img, cfg))
        m = pitch_accuracy(recon, pitches, cfg.sample_rate)
        assert m["pitch_accuracy"] == 1.0, m
        # regression guard on spectral distance (the mel pinv floors
        # low-energy bins, which dominates this metric; ~5 nats is the
        # current lossy-roundtrip level)
        assert log_spectral_distance(waves, recon) < 8.0


class TestLogSpectralDistance:
    def test_zero_for_identical(self):
        w = synthesize_note(60)[None]
        assert log_spectral_distance(w, w) == 0.0

    def test_orders_distances(self):
        a = synthesize_note(60, seed=1)[None]
        b = synthesize_note(60, seed=2)[None]   # same pitch, new phases
        c = synthesize_note(84, seed=3)[None]   # different pitch
        assert log_spectral_distance(a, b) < log_spectral_distance(a, c)


class TestEvaluateSampler:
    def test_harness_on_oracle_sampler(self):
        """Feed a 'perfect generator' (fixtures through the spectral
        roundtrip) and expect near-perfect scores."""
        cfg = AudioConfig()

        def oracle_sampler(key, pitches):
            waves = np.stack([synthesize_note(int(p)) for p in pitches])
            img = wave_to_image(jnp.asarray(waves), cfg)
            return jnp.asarray(image_to_wave(img, cfg)), img

        m = evaluate_sampler(
            oracle_sampler, pitches=[40, 60, 80], samples_per_pitch=2
        )
        assert m["num_samples"] == 6.0
        assert m["pitch_accuracy"] == 1.0
        assert m["rms"] > 0.01

    def test_harness_reports_lsd_against_reference(self):
        """With a pitch-matched reference the harness adds the
        log-spectral-distance readout; an oracle sampler (the roundtrip
        itself) must score below an unconditioned mismatch."""
        from gansynth_tpu.evaluation import fixture_reference_fn

        cfg = AudioConfig()

        def oracle_sampler(key, pitches):
            waves = np.stack([synthesize_note(int(p)) for p in pitches])
            img = wave_to_image(jnp.asarray(waves), cfg)
            return jnp.asarray(image_to_wave(img, cfg)), img

        def noise_sampler(key, pitches):
            rng = np.random.default_rng(0)
            waves = 0.1 * rng.standard_normal((len(pitches), 64000))
            return jnp.asarray(waves.astype(np.float32)), None

        ref = fixture_reference_fn()
        m_good = evaluate_sampler(
            oracle_sampler, pitches=[40, 60], samples_per_pitch=1,
            reference_fn=ref,
        )
        m_bad = evaluate_sampler(
            noise_sampler, pitches=[40, 60], samples_per_pitch=1,
            reference_fn=ref,
        )
        assert np.isfinite(m_good["log_spectral_distance"])
        assert (
            m_good["log_spectral_distance"] < m_bad["log_spectral_distance"]
        )

    def test_tfrecord_reference_fn(self, tmp_path):
        pytest.importorskip("tensorflow")
        from gansynth_tpu.data import write_synthetic_tfrecords
        from gansynth_tpu.evaluation import tfrecord_reference_fn
        from gansynth_tpu.utils.config import Config

        path = str(tmp_path / "ref.tfrecord")
        write_synthetic_tfrecords(path, num_examples=8,
                                  pitches=[50, 62], seed=0)
        ref = tfrecord_reference_fn([path], Config())
        w = ref(50, 0)
        assert w.shape == (64000,) and np.isfinite(w).all()
        assert abs(detect_midi_pitch(w) - 50) < 0.5
        with pytest.raises(KeyError):
            ref(24, 0)
