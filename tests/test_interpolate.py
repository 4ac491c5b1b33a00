"""Latent/pitch interpolation (synth/interpolate.py + ``cli interpolate``).

The math layer is pure numpy, so properties are checked exactly; the CLI
end-to-end renders a real (tiny) trained model's morph path through the
jitted explicit-latent sampler.
"""

import os

import numpy as np
import pytest

from gansynth_tpu.synth.interpolate import (
    crossfade_concat,
    interpolation_labels,
    interpolation_latents,
    slerp,
)


class TestSlerp:
    def test_endpoints_exact(self):
        rng = np.random.default_rng(0)
        za, zb = rng.normal(size=(2, 32)).astype(np.float32)
        path = slerp(za, zb, np.array([0.0, 1.0]))
        np.testing.assert_allclose(path[0], za, atol=1e-6)
        np.testing.assert_allclose(path[1], zb, atol=1e-6)

    def test_midpoint_of_orthogonal_units_stays_on_sphere(self):
        za = np.zeros(8, np.float32); za[0] = 1.0
        zb = np.zeros(8, np.float32); zb[1] = 1.0
        mid = slerp(za, zb, 0.5)
        assert np.linalg.norm(mid) == pytest.approx(1.0, abs=1e-6)

    def test_shell_norm_preserved_vs_lerp_shrinkage(self):
        # Gaussian draws sit near the sqrt(D) shell; slerp midpoints
        # should too, while lerp midpoints of independent draws shrink
        # toward sqrt(D/2) — the reason slerp is the default.
        rng = np.random.default_rng(1)
        d = 256
        za, zb = rng.normal(size=(2, d))
        shell = np.sqrt(d)
        s_mid = np.linalg.norm(slerp(za, zb, 0.5))
        l_mid = np.linalg.norm(
            interpolation_latents(za, zb, 3, mode="lerp")[1]
        )
        assert abs(s_mid - shell) / shell < 0.1
        assert abs(l_mid - shell * np.sqrt(0.5)) / shell < 0.1

    def test_parallel_vectors_fall_back_to_lerp(self):
        za = np.ones(16, np.float32)
        out = slerp(za, za * (1.0 + 1e-9), 0.5)
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(out, za, rtol=1e-5)

    def test_zero_endpoint_degrades_to_lerp(self):
        zb = np.ones(4, np.float32)
        out = slerp(np.zeros(4), zb, np.array([0.25]))
        np.testing.assert_allclose(out[0], 0.25 * zb, atol=1e-6)


class TestPath:
    def test_latents_shape_and_monotone_angle(self):
        rng = np.random.default_rng(2)
        za, zb = rng.normal(size=(2, 64))
        path = interpolation_latents(za, zb, 7)
        assert path.shape == (7, 64)
        # angle to za grows monotonically along a great-circle path
        cos = path @ za / (np.linalg.norm(path, axis=1)
                           * np.linalg.norm(za))
        assert np.all(np.diff(np.arccos(np.clip(cos, -1, 1))) > 0)

    def test_too_short_path_rejected(self):
        with pytest.raises(ValueError):
            interpolation_latents(np.ones(4), np.ones(4), 1)
        with pytest.raises(ValueError):
            interpolation_latents(np.ones(4), np.ones(4), 5, mode="bogus")

    def test_labels_fixed_pitch_is_constant_onehot(self):
        lab = interpolation_labels(60, 60, 5, pitch_min=24, num_pitches=61)
        assert lab.shape == (5, 61)
        expected = np.zeros(61); expected[36] = 1.0
        np.testing.assert_allclose(lab, np.tile(expected, (5, 1)))

    def test_labels_glide_is_convex_mixture(self):
        lab = interpolation_labels(24, 84, 3, pitch_min=24, num_pitches=61)
        np.testing.assert_allclose(lab.sum(axis=1), 1.0, atol=1e-6)
        assert lab[1, 0] == pytest.approx(0.5)
        assert lab[1, 60] == pytest.approx(0.5)
        assert lab[0, 0] == 1.0 and lab[2, 60] == 1.0


class TestCrossfade:
    def test_zero_overlap_is_concatenation(self):
        waves = np.arange(12, dtype=np.float32).reshape(3, 4)
        np.testing.assert_array_equal(
            crossfade_concat(waves, 0), waves.reshape(-1)
        )

    def test_length_and_untouched_interiors(self):
        rng = np.random.default_rng(3)
        waves = rng.normal(size=(3, 100)).astype(np.float32)
        out = crossfade_concat(waves, 20)
        assert out.shape == (3 * 100 - 2 * 20,)
        # regions outside any fade are bit-identical to the inputs
        np.testing.assert_array_equal(out[:80], waves[0, :80])
        np.testing.assert_array_equal(out[100:160], waves[1, 20:80])
        np.testing.assert_array_equal(out[180:], waves[2, 20:])

    def test_equal_power_seam(self):
        # crossfading two unit-amplitude DC segments: summed POWER of the
        # fade gains is 1 everywhere in the seam (cos^2 + sin^2)
        waves = np.ones((2, 50), np.float32)
        out = crossfade_concat(waves, 10)
        seam = out[40:50]
        theta = np.linspace(0.0, np.pi / 2, 10)
        np.testing.assert_allclose(
            seam, np.cos(theta) + np.sin(theta), atol=1e-6
        )

    def test_overlap_bounds_checked(self):
        with pytest.raises(ValueError):
            crossfade_concat(np.ones((2, 10), np.float32), 11)


class TestCLI:
    def test_train_then_interpolate(self, tmp_path):
        pytest.importorskip("tensorflow")
        from gansynth_tpu.cli import main as cli_main
        from gansynth_tpu.data import write_synthetic_tfrecords
        from gansynth_tpu.utils.audio_io import read_wav

        tfrecord = write_synthetic_tfrecords(
            str(tmp_path / "notes.tfrecord"), num_examples=8, seed=0
        )
        model_dir = str(tmp_path / "m")
        assert cli_main([
            "train", "--model-dir", model_dir, "--data", tfrecord,
            "--synthetic", "--num-steps", "2", "--batch-size", "2",
            "--latent-dim", "8", "--fmap-base", "64", "--fmap-max", "16",
            "--fade-steps", "3", "--stable-steps", "3",
            "--checkpoint-every", "2", "--log-every", "1",
        ]) == 0
        out_dir = str(tmp_path / "morph")
        assert cli_main([
            "interpolate", "--model-dir", model_dir,
            "--output-dir", out_dir,
            "--pitch", "48", "--pitch-b", "72",
            "--steps", "4", "--crossfade-ms", "250",
            "--latent-dim", "8", "--fmap-base", "64", "--fmap-max", "16",
        ]) == 0
        files = sorted(os.listdir(out_dir))
        assert files == [
            "interp_00_t0.00.wav", "interp_01_t0.33.wav",
            "interp_02_t0.67.wav", "interp_03_t1.00.wav", "morph.wav",
        ]
        note, sr = read_wav(os.path.join(out_dir, files[0]))
        assert sr == 16000 and note.shape == (64000,)
        morph, _ = read_wav(os.path.join(out_dir, "morph.wav"))
        overlap = int(0.250 * 16000)
        assert morph.shape == (4 * 64000 - 3 * overlap,)
