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

    def test_floor_discounts_silence_mismatch(self):
        """Raw LSD between a clean note and the same note plus an
        inaudible noise floor is dominated by silent-bin log-ratios; the
        -60 dB-floored variant is not (the round-2 'LSD plateau'
        mechanism, quantified in DESIGN.md §4c)."""
        rng = np.random.default_rng(0)
        clean = synthesize_note(60, seed=1)[None]
        noisy = clean + 1e-4 * rng.standard_normal(clean.shape)
        raw = log_spectral_distance(clean, noisy)
        floored = log_spectral_distance(clean, noisy, floor_db=-60.0)
        assert raw > 10 * floored, (raw, floored)
        assert floored < 0.1, floored
        # identical inputs still score ~0 under the floor
        assert log_spectral_distance(clean, clean, floor_db=-60.0) == 0.0
        # ...and the floor preserves ordering on audible differences
        b = synthesize_note(60, seed=2)[None]
        c = synthesize_note(84, seed=3)[None]
        assert (
            log_spectral_distance(clean, b, floor_db=-60.0)
            < log_spectral_distance(clean, c, floor_db=-60.0)
        )


class TestAttribution:
    def test_wilson_interval(self):
        from gansynth_tpu.evaluation import wilson_interval

        lo, hi = wilson_interval(88, 100)
        assert lo < 0.88 < hi
        assert hi - lo < 0.15
        lo2, hi2 = wilson_interval(880, 1000)
        assert hi2 - lo2 < hi - lo  # more samples -> tighter
        assert wilson_interval(0, 0) == (0.0, 1.0)

    def test_attribution_classifies_failures(self):
        from gansynth_tpu.evaluation import pitch_attribution

        # 3 clean notes + 1 note LABELED an octave below what it is:
        # both detectors find the true pitch -> a both-fail octave_up.
        waves = np.stack([
            synthesize_note(48, seed=1),
            synthesize_note(60, seed=2),
            synthesize_note(72, seed=3),
            synthesize_note(72, seed=4),
        ])
        rep = pitch_attribution(waves, [48, 60, 72, 60])
        assert rep["n"] == 4
        assert rep["accuracy_either"] == 0.75
        lo, hi = rep["ci95_either"]
        assert lo < 0.75 < hi
        assert rep["failures"]["both"] == 1
        assert rep["both_failure_modes"]["octave_up"] == 1
        assert rep["by_region"]["mid_44_63"]["both_fail"] == 1
        assert rep["per_pitch"][48]["ok_either"] == 1
        assert rep["per_pitch"][60]["ok_either"] == 1  # of n=2

    def test_evaluate_sampler_attribution_flag(self):
        def oracle(key, pitches):
            waves = np.stack([
                synthesize_note(int(p), seed=int(p)) for p in pitches
            ])
            return jnp.asarray(waves), None

        m = evaluate_sampler(
            oracle, pitches=[40, 60], samples_per_pitch=1,
            attribution=True,
        )
        assert m["attribution"]["n"] == 2
        assert m["attribution"]["accuracy_either"] == 1.0


class TestDistributionMetrics:
    """Mode-collapse / distribution-quality readouts (VERDICT r2 item 1):
    pitch metrics measure conditioning obedience only; these measure
    within-pitch variability and whole-distribution match."""

    def test_diversity_zero_for_collapsed_positive_for_varied(self):
        from gansynth_tpu.evaluation import intra_pitch_diversity

        collapsed = np.stack([
            synthesize_note(60), synthesize_note(60),
            synthesize_note(72), synthesize_note(72),
        ])
        assert intra_pitch_diversity(collapsed, [60, 60, 72, 72]) == 0.0

        varied = np.stack([
            synthesize_note(60, seed=1), synthesize_note(60, seed=2),
            synthesize_note(72, seed=3), synthesize_note(72, seed=4),
        ])
        d = intra_pitch_diversity(varied, [60, 60, 72, 72])
        assert d > 0.1

        # singleton pitches contribute no pairs -> NaN, not a crash
        assert np.isnan(intra_pitch_diversity(varied, [60, 61, 72, 73]))

    def test_melspec_features(self):
        from gansynth_tpu.evaluation import melspec_features

        waves = np.stack([
            synthesize_note(60, seed=1), synthesize_note(72, seed=2)
        ])
        f = melspec_features(waves, num_bands=32)
        assert f.shape == (2, 64)
        assert np.isfinite(f).all()
        # different timbres land at different embeddings
        assert np.abs(f[0] - f[1]).max() > 0.1

    def test_frechet_orders_distributions(self):
        from gansynth_tpu.evaluation import frechet_distance, melspec_features

        def note_set(pitches, seed0):
            return np.stack([
                synthesize_note(p, seed=seed0 + i,
                                num_harmonics=2 + (seed0 + i) % 5)
                for i, p in enumerate(pitches)
            ])

        mid = [48, 52, 56, 60, 64, 68, 72, 76] * 2
        low = [24, 26, 28, 30, 32, 34, 36, 38] * 2
        fa = melspec_features(note_set(mid, 0), num_bands=32)
        fb = melspec_features(note_set(mid, 100), num_bands=32)  # same dist
        fc = melspec_features(note_set(low, 200), num_bands=32)  # shifted
        assert abs(frechet_distance(fa, fa)) < 1e-3  # identical sets ~ 0
        assert frechet_distance(fa, fb) < frechet_distance(fa, fc)

    def test_frechet_floor_discounts_silence_offset(self):
        """An inaudible noise floor shifts the raw embedding means of
        every silent mel band; the floored embedding ignores it (the
        frechet_mel=1856 vs ref-floor=0.12 anomaly in the r2 full eval,
        DESIGN.md §4c)."""
        from gansynth_tpu.evaluation import frechet_distance, melspec_features

        rng = np.random.default_rng(1)
        notes = np.stack([
            synthesize_note(40 + 3 * i, seed=i) for i in range(8)
        ])
        noisy = notes + 1e-4 * rng.standard_normal(notes.shape)
        raw = frechet_distance(
            melspec_features(notes), melspec_features(noisy)
        )
        floored = frechet_distance(
            melspec_features(notes, floor_db=-60.0),
            melspec_features(noisy, floor_db=-60.0),
        )
        assert raw > 5 * max(floored, 1e-9), (raw, floored)

    def test_evaluate_sampler_reports_distribution_metrics(self):
        from gansynth_tpu.evaluation import fixture_reference_fn

        calls = [0]

        def varied_sampler(key, pitches):
            calls[0] += 1
            waves = np.stack([
                synthesize_note(int(p), seed=1000 + 31 * calls[0] + i)
                for i, p in enumerate(pitches)
            ])
            return jnp.asarray(waves), None

        def collapsed_sampler(key, pitches):
            waves = np.stack([synthesize_note(int(p)) for p in pitches])
            return jnp.asarray(waves), None

        ref = fixture_reference_fn()
        m = evaluate_sampler(
            varied_sampler, pitches=[48, 60], samples_per_pitch=3,
            reference_fn=ref,
        )
        assert np.isfinite(m["frechet_mel"])
        assert m["intra_pitch_diversity"] > 0.1
        assert np.isfinite(m["intra_pitch_diversity_ref"])
        assert m["diversity_ratio"] > 0.2

        m_c = evaluate_sampler(
            collapsed_sampler, pitches=[48, 60], samples_per_pitch=3,
            reference_fn=ref,
        )
        assert m_c["intra_pitch_diversity"] == 0.0
        assert m_c["diversity_ratio"] == 0.0
        # the collapsed generator is indistinguishable on pitch metrics
        # but flagged by the diversity ratio
        assert m_c["pitch_accuracy"] == 1.0


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


def test_cli_pitch_accuracy_summary_line():
    """The evaluate CLI's one-line summary always pairs the either-
    detector union with BOTH per-detector numbers (VERDICT r3 honesty
    rule), and stays silent when the metrics are absent."""
    from gansynth_tpu.cli import _pitch_accuracy_summary

    line = _pitch_accuracy_summary({
        "pitch_accuracy": 0.943,
        "pitch_accuracy_acf": 0.990,
        "pitch_accuracy_either": 1.0,
    })
    assert line == (
        "pitch accuracy: HPS 94.3% / ACF 99.0%"
        " / either-detector union 100.0%"
    )
    assert _pitch_accuracy_summary({"pitch_accuracy": 1.0}) == ""


class TestSparseHarmonicRegression:
    """Octave-attribution regression matrix (VERDICT-r4 item 5).

    The raw 1/h-weighted harmonic sum errs OCTAVE-UP whenever the 2nd
    harmonic dominates (round-4 flagship: the HPS-only 7.2% disagreement
    was exactly this, with ACF agreeing with the label). These fixtures
    pin every case class with KNOWN f0s: the corrected detector must get
    the fundamental right whenever there is spectral evidence for it,
    and must NOT invent a lower octave when there is none."""

    SR = 16000

    @staticmethod
    def note(pitch, amps, noise=0.0, seed=0, n=64000, sr=16000):
        t = np.arange(n) / sr
        f0 = float(midi_to_hz(pitch))
        w = sum(
            a * np.sin(2 * np.pi * f0 * h * t + 0.1 * h)
            for h, a in amps.items()
        )
        if noise:
            w = w + noise * np.random.default_rng(seed).normal(size=n)
        return w * np.exp(-t * 1.5)

    # Every stack with ANY fundamental-line evidence resolves to the
    # true f0 — including the dominant-2nd cases the raw argmax flipped.
    CASES = {
        "full_stack": {1: 1.0, 2: 0.5, 3: 0.33, 4: 0.25},
        "weak_fundamental": {1: 0.05, 2: 1.0, 3: 0.6, 4: 0.4},
        "missing_fundamental_odd": {2: 1.0, 3: 0.7, 4: 0.4},
        "strong_2nd_only": {1: 0.15, 2: 1.0},
        "fund_2nd_dominant": {1: 0.4, 2: 1.0, 4: 0.3},
    }

    @pytest.mark.parametrize("pitch", [24, 36, 48, 60, 72, 84])
    @pytest.mark.parametrize("case", sorted(CASES))
    def test_hps_octave_correction(self, pitch, case):
        w = self.note(pitch, self.CASES[case], seed=pitch)
        got = detect_midi_pitch(w, self.SR)
        assert abs(got - pitch) <= 0.5, f"{case}: {got:.2f}"

    @pytest.mark.parametrize("pitch", [24, 36, 48, 60, 72])
    @pytest.mark.parametrize("case", sorted(CASES))
    def test_raw_argmax_was_the_bug(self, pitch, case):
        """The uncorrected argmax really does flip octave-up on the
        dominant-2nd stacks — keeps the regression honest: if this ever
        starts passing, the spectrum construction changed and the matrix
        needs re-deriving. (p84 excluded: 2*f0 = 2093 Hz falls outside
        the 2 kHz search band, so the bug cannot manifest there.)"""
        if case == "full_stack":
            pytest.skip("raw argmax is correct on a full stack")
        w = self.note(pitch, self.CASES[case], seed=pitch)
        raw = detect_midi_pitch(w, self.SR, octave_correction=False)
        assert abs(raw - (pitch + 12)) <= 0.5

    @pytest.mark.parametrize("pitch", [36, 48, 60, 72])
    def test_even_only_stack_stays_at_upper_octave(self, pitch):
        """Energy ONLY at multiples of 2*f0 IS a note at 2*f0: zero
        unique subharmonic evidence means no correction — the detector
        must not invent a lower octave."""
        w = self.note(pitch, {2: 1.0, 4: 0.5, 6: 0.3}, seed=pitch)
        got = detect_midi_pitch(w, self.SR)
        assert abs(got - (pitch + 12)) <= 0.5

    @pytest.mark.parametrize("pitch", [24, 36, 48, 60, 72, 84])
    @pytest.mark.parametrize("case", sorted(CASES))
    def test_cepstrum_on_clean_stacks(self, pitch, case):
        from gansynth_tpu.evaluation import detect_midi_pitch_cepstrum

        w = self.note(pitch, self.CASES[case], seed=pitch)
        got = detect_midi_pitch_cepstrum(w, self.SR)
        assert abs(got - pitch) <= 0.5, f"{case}: {got:.2f}"

    def test_cepstrum_undefined_for_single_partial(self):
        from gansynth_tpu.evaluation import detect_midi_pitch_cepstrum

        w = self.note(60, {1: 1.0})
        assert np.isnan(detect_midi_pitch_cepstrum(w, self.SR))

    def test_detector_disagreement_is_attributed_per_note(self):
        """pitch_attribution commits per-note evidence for every
        disagreement: which detector deviated and where the others
        landed (the flagship eval's artifact-vs-model-error receipts)."""
        from gansynth_tpu.evaluation import pitch_attribution

        waves = np.stack([
            synthesize_note(60, seed=1),
            self.note(48, self.CASES["weak_fundamental"], seed=2),
            synthesize_note(72, seed=3),
        ])
        rep = pitch_attribution(waves, [60, 48, 60])
        # note 2 is LABELED 60 but synthesized at 72: a true model-style
        # error -> appears in disagreements with all detectors at 72.
        assert rep["accuracy_hps"] == pytest.approx(2 / 3)
        rows = {r["index"]: r for r in rep["disagreements"]}
        assert 2 in rows
        assert abs(rows[2]["hps"] - 72) <= 0.5
        assert abs(rows[2]["acf"] - 72) <= 0.5
        assert "accuracy_cepstrum" in rep and "cepstrum_coverage" in rep

    def test_accuracy_batch_reports_cepstrum_with_coverage(self):
        from gansynth_tpu.evaluation import pitch_accuracy

        waves = np.stack([
            synthesize_note(48, seed=1),
            self.note(60, {1: 1.0}),  # cepstrum-undefined (pure sine)
        ])
        m = pitch_accuracy(waves, [48, 60])
        assert m["pitch_accuracy"] == 1.0
        assert m["pitch_cepstrum_coverage"] == pytest.approx(0.5)
        assert m["pitch_accuracy_cepstrum"] == 1.0
