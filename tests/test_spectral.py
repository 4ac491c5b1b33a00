"""Golden tests for the spectral core (SURVEY.md §4 item 1, driver config 1).

Oracles: numpy (unwrap), scipy.signal (STFT framing/windowing), and — when
importable — tf.signal (windows, mel matrix, full STFT/iSTFT), per
SURVEY.md §4. No reference code exists to port tests from; these encode the
algorithm spec directly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gansynth_tpu.ops import (
    diff,
    unwrap,
    instantaneous_frequency,
    frame_signal,
    overlap_add,
    stft,
    istft,
    hann_window,
    inverse_stft_window,
    linear_to_mel_matrix,
    mel_to_linear_matrix,
    specgrams_to_melspecgrams,
    melspecgrams_to_specgrams,
    wave_to_specgrams,
    specgrams_to_wave,
    wave_to_image,
    image_to_wave,
)
from gansynth_tpu.utils.config import AudioConfig, scale

CFG = AudioConfig()

tf = pytest.importorskip("tensorflow", reason="tf.signal oracle unavailable")


def tone(freqs, sr=16000, n=64000, amps=None, rng=None):
    t = np.arange(n) / sr
    freqs = np.atleast_1d(freqs)
    amps = np.ones_like(freqs, dtype=np.float64) if amps is None else amps
    w = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))
    w = w / max(1.0, np.abs(w).max())
    if rng is not None:
        w = w + 0.001 * rng.standard_normal(n)
    return w.astype(np.float32)


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------

class TestWindows:
    def test_hann_matches_tf(self):
        ours = hann_window(2048)
        theirs = tf.signal.hann_window(2048).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_inverse_window_matches_tf(self):
        fwd = hann_window(2048)
        ours = inverse_stft_window(fwd, 512)
        theirs = tf.signal.inverse_stft_window_fn(512)(2048, tf.float32).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_ola_identity(self):
        # synthesis window * analysis window summed over overlaps == 1
        fwd = hann_window(2048).astype(np.float64)
        syn = inverse_stft_window(fwd, 512).astype(np.float64)
        prod = (fwd * syn).reshape(4, 512).sum(axis=0)
        np.testing.assert_allclose(prod, 1.0, atol=1e-12)


# ---------------------------------------------------------------------------
# diff / unwrap / IF
# ---------------------------------------------------------------------------

class TestPhaseOps:
    def test_diff_matches_numpy(self, rng):
        x = rng.standard_normal((3, 16, 5)).astype(np.float32)
        np.testing.assert_allclose(
            diff(jnp.asarray(x), axis=-2), np.diff(x, axis=-2), atol=1e-6
        )

    def test_unwrap_matches_numpy(self, rng):
        # Phase ramps with known wrap points plus noise, wrapped to (-pi, pi].
        ramp = np.cumsum(rng.uniform(-2.5, 2.5, size=(4, 128, 8)), axis=1)
        wrapped = np.angle(np.exp(1j * ramp)).astype(np.float32)
        ours = np.asarray(unwrap(jnp.asarray(wrapped), axis=-2))
        theirs = np.unwrap(wrapped.astype(np.float64), axis=-2)
        np.testing.assert_allclose(ours, theirs, atol=1e-3)

    def test_unwrap_recovers_linear_ramp(self):
        # A pure tone's STFT phase advances linearly; unwrap must recover it.
        slope = 2.0  # > pi, so every step wraps
        ramp = slope * np.arange(64)[:, None] * np.ones((1, 3))
        wrapped = np.angle(np.exp(1j * ramp)).astype(np.float32)
        ours = np.asarray(unwrap(jnp.asarray(wrapped), axis=-2))
        np.testing.assert_allclose(ours, ramp, atol=1e-4)

    def test_if_shape_preserving_and_bounded(self, rng):
        phase = rng.uniform(-np.pi, np.pi, size=(2, 128, 1024)).astype(np.float32)
        ifreq = instantaneous_frequency(jnp.asarray(phase), axis=-2)
        assert ifreq.shape == phase.shape

    def test_if_cumsum_roundtrip(self, rng):
        # cumsum(IF * pi) must reproduce the unwrapped phase exactly
        # (including the initial frame, which IF embeds as its first row).
        phase = rng.uniform(-np.pi, np.pi, size=(2, 64, 16)).astype(np.float32)
        ifreq = instantaneous_frequency(jnp.asarray(phase), axis=-2)
        recon = np.cumsum(np.asarray(ifreq) * np.pi, axis=-2)
        unwrapped = np.asarray(unwrap(jnp.asarray(phase), axis=-2))
        np.testing.assert_allclose(recon, unwrapped, atol=1e-3)
        # and its wrapped angle equals the original phase
        np.testing.assert_allclose(
            np.angle(np.exp(1j * recon)), phase, atol=1e-3
        )


# ---------------------------------------------------------------------------
# framing / STFT / iSTFT
# ---------------------------------------------------------------------------

class TestSTFT:
    def test_frame_matches_manual(self, rng):
        x = rng.standard_normal((2, 100)).astype(np.float32)
        frames = np.asarray(frame_signal(jnp.asarray(x), 16, 4))
        assert frames.shape == (2, (100 - 16) // 4 + 1, 16)
        for i in range(frames.shape[1]):
            np.testing.assert_array_equal(frames[:, i], x[:, i * 4 : i * 4 + 16])

    def test_overlap_add_inverts_framing_sum(self, rng):
        # OLA(frame(x)) == x * (number of frames covering each sample)
        x = rng.standard_normal(64).astype(np.float32)
        frames = frame_signal(jnp.asarray(x), 8, 4)
        ola = np.asarray(overlap_add(frames, 4))
        cover = np.zeros(64)
        for i in range((64 - 8) // 4 + 1):
            cover[i * 4 : i * 4 + 8] += 1
        np.testing.assert_allclose(ola, x * cover, atol=1e-6)

    def test_stft_shape(self, rng):
        wave = rng.standard_normal((3, CFG.audio_length)).astype(np.float32)
        spec = stft(jnp.asarray(wave), CFG)
        assert spec.shape == (3, 128, 1024)  # [E:BASELINE.json:2,5]
        assert spec.dtype == jnp.complex64

    def test_stft_matches_tf_signal(self, rng):
        wave = tone(440.0, rng=rng)
        padded = np.pad(wave, (CFG.pad_left, CFG.pad_right))
        theirs = tf.signal.stft(
            padded, frame_length=2048, frame_step=512, fft_length=2048
        ).numpy()[:, 1:]
        ours = np.asarray(stft(jnp.asarray(wave), CFG))
        assert ours.shape == theirs.shape == (128, 1024)
        np.testing.assert_allclose(ours, theirs, atol=2e-3)

    def test_stft_istft_roundtrip_interior(self, rng):
        # Near-exact in the fully-overlapped interior (SURVEY.md §7
        # hard-part 1); edges excluded. The default config drops the DC
        # bin (reference behavior) which is mildly lossy (~3e-3 max on a
        # noisy tone), so assert a high SNR rather than float tolerance.
        wave = tone([261.6, 523.2], amps=[1.0, 0.5], rng=rng)
        recon = np.asarray(istft(stft(jnp.asarray(wave), CFG), CFG))
        assert recon.shape == wave.shape
        lo = CFG.frame_length - CFG.pad_left
        hi = CFG.audio_length - (CFG.frame_length - CFG.pad_right)
        assert snr_db(wave[lo:hi], recon[lo:hi]) > 40.0

    def test_stft_istft_ola_machinery_exact(self, rng):
        # With the (near-lossless) Nyquist-drop variant the frame/window/
        # FFT/OLA machinery must reconstruct to float32 tolerance — this
        # isolates OLA correctness from the DC-drop information loss.
        import dataclasses

        cfg = dataclasses.replace(CFG, discard_dc=False)
        wave = tone([261.6, 523.2], amps=[1.0, 0.5], rng=rng)
        recon = np.asarray(istft(stft(jnp.asarray(wave), cfg), cfg))
        lo = cfg.frame_length - cfg.pad_left
        hi = cfg.audio_length - (cfg.frame_length - cfg.pad_right)
        np.testing.assert_allclose(recon[lo:hi], wave[lo:hi], atol=2e-4)

    def test_pure_tone_peak_bin(self):
        # Energy concentrates at the expected rFFT bin (shifted by the
        # dropped DC bin): f = k * sr / nfft -> bin index k - 1.
        f = 1000.0
        wave = tone(f)
        spec = np.abs(np.asarray(stft(jnp.asarray(wave), CFG)))
        peak = spec[64].argmax()
        expected = round(f * CFG.frame_length / CFG.sample_rate) - 1
        assert abs(int(peak) - expected) <= 1


# ---------------------------------------------------------------------------
# mel
# ---------------------------------------------------------------------------

class TestMel:
    def test_matrix_matches_tf_signal(self):
        ours = linear_to_mel_matrix(1024, 1024, 16000.0, 0.0, 8000.0)
        theirs = tf.signal.linear_to_mel_weight_matrix(
            num_mel_bins=1024,
            num_spectrogram_bins=1024,
            sample_rate=16000,
            lower_edge_hertz=0.0,
            upper_edge_hertz=8000.0,
        ).numpy()
        assert ours.shape == (1024, 1024)
        # tf computes the mel scale in float32; we use float64 — identical
        # filterbank up to f32 rounding of the band edges.
        np.testing.assert_allclose(ours, theirs, atol=5e-4)
        assert (ours > 0).sum() == (theirs > 0).sum()

    def test_pinv_identity_quality(self):
        # M @ pinv(M) should be near-diagonal: the heuristic pinv must at
        # least approximately invert on the mel subspace.
        m = linear_to_mel_matrix(64, 256, 16000.0, 0.0, 8000.0).astype(np.float64)
        p = mel_to_linear_matrix(m).astype(np.float64)
        # mel roundtrip operator on mel row-vectors: v @ p -> linear, @ m -> mel
        round_op = p @ m
        diag = np.diag(round_op)
        off = round_op - np.diag(diag)
        assert diag.mean() > 0.5
        assert np.abs(off).sum(axis=1).mean() < diag.mean() * 2.0

    def test_mel_roundtrip_specgrams(self, rng):
        wave = tone([440.0, 880.0], amps=[1.0, 0.3], rng=rng)
        logmag, ifreq = wave_to_specgrams(jnp.asarray(wave), CFG)
        lmm2, mif = specgrams_to_melspecgrams(logmag, ifreq, CFG)
        assert lmm2.shape == (128, 1024) and mif.shape == (128, 1024)
        logmag2, ifreq2 = melspecgrams_to_specgrams(lmm2, mif, CFG)
        # Lossy by design (S7): the pinv floors low-energy bins at
        # log(eps)/2 and smears wide high-frequency mel bands. Log-domain
        # correlation stays high and power-domain correlation (dominated
        # by the actual spectral peaks) is near-perfect.
        a = np.asarray(logmag).ravel()
        b = np.asarray(logmag2).ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.9
        pa, pb = np.exp(2 * a), np.exp(2 * b)
        assert np.corrcoef(pa, pb)[0, 1] > 0.99


# ---------------------------------------------------------------------------
# end-to-end roundtrips (driver config 1)
# ---------------------------------------------------------------------------

def snr_db(ref, est):
    noise = ref - est
    return 10 * np.log10((ref**2).sum() / max((noise**2).sum(), 1e-30))


class TestFastPaths:
    """The TPU-optimized lowerings must compute the same functions."""

    def test_matmul_idft_matches_fft(self, rng):
        import dataclasses

        cfg_mm = dataclasses.replace(CFG, idft_mode="matmul")
        cfg_fft = dataclasses.replace(CFG, idft_mode="fft")
        re = rng.standard_normal((2, 128, 1024)).astype(np.float32)
        im = rng.standard_normal((2, 128, 1024)).astype(np.float32)
        spec = jnp.asarray(re + 1j * im)
        a = np.asarray(istft(spec, cfg_fft))
        b = np.asarray(istft(spec, cfg_mm))
        np.testing.assert_allclose(a, b, atol=2e-3)
        # and the same through a full roundtrip
        wave = tone(392.0, rng=rng)
        ra = np.asarray(istft(stft(jnp.asarray(wave), cfg_fft), cfg_fft))
        rb = np.asarray(istft(stft(jnp.asarray(wave), cfg_mm), cfg_mm))
        np.testing.assert_allclose(ra, rb, atol=2e-3)

    def test_matmul_dft_matches_fft(self, rng):
        import dataclasses

        cfg_mm = dataclasses.replace(CFG, dft_mode="matmul")
        wave = tone([523.2, 784.0], amps=[1.0, 0.5], rng=rng)
        a = np.asarray(stft(jnp.asarray(wave), CFG))
        b = np.asarray(stft(jnp.asarray(wave), cfg_mm))
        np.testing.assert_allclose(a, b, atol=2e-3)

    def test_simplified_synthesis_matches_naive_composition(self, rng):
        """melspecgrams_to_wave's algebraic shortcut (no unwrap/IF in the
        synthesis direction) == the literal S9+S10 composition."""
        from gansynth_tpu.ops import melspecgrams_to_wave

        wave = tone([440.0, 660.0], amps=[1.0, 0.4], rng=rng)
        logmag, ifreq = wave_to_specgrams(jnp.asarray(wave), CFG)
        lmm2, mif = specgrams_to_melspecgrams(logmag, ifreq, CFG)

        fast = np.asarray(melspecgrams_to_wave(lmm2, mif, CFG))
        logmag2, ifreq2 = melspecgrams_to_specgrams(lmm2, mif, CFG)
        naive = np.asarray(specgrams_to_wave(logmag2, ifreq2, CFG))
        # identical up to float noise of the extra unwrap/IF passes; scale
        # of the signal is O(1)
        np.testing.assert_allclose(fast, naive, atol=5e-2)
        assert snr_db(naive, fast) > 30.0


class TestRoundtrip:
    def test_specgrams_roundtrip_snr(self, rng):
        # wave -> (logmag, IF) -> wave without mel: near-lossless interior.
        wave = tone([329.6, 659.2], amps=[1.0, 0.4], rng=rng)
        logmag, ifreq = wave_to_specgrams(jnp.asarray(wave), CFG)
        recon = np.asarray(specgrams_to_wave(logmag, ifreq, CFG))
        lo, hi = CFG.frame_length, CFG.audio_length - CFG.frame_length
        assert snr_db(wave[lo:hi], recon[lo:hi]) > 30.0

    def test_image_roundtrip_shapes_and_audio(self, rng):
        # Full driver-config-1 path: wave -> 128x1024x2 image -> wave.
        wave = tone(440.0, rng=rng)[None]  # batched
        img = np.asarray(wave_to_image(jnp.asarray(wave), CFG))
        assert img.shape == (1, 128, 1024, 2)
        assert np.isfinite(img).all()
        # channel 0 scaled into a sane range, channel 1 is IF in [-1,1]
        # except its first time-frame, which embeds the initial phase
        # projected through mel filters whose column sums can exceed 1.
        assert img[..., 0].min() >= -1.5 and img[..., 0].max() <= 1.5
        assert np.abs(img[:, 1:, :, 1]).max() <= 1.0 + 1e-3
        recon = np.asarray(image_to_wave(jnp.asarray(img), CFG))
        assert recon.shape == wave.shape
        assert np.isfinite(recon).all()
        # Mel pinv is lossy, but a pure tone must survive recognizably:
        # dominant frequency of the reconstruction matches the input.
        interior = recon[0, CFG.frame_length : -CFG.frame_length]
        spec = np.abs(np.fft.rfft(interior))
        f_peak = spec.argmax() * CFG.sample_rate / interior.size
        assert abs(f_peak - 440.0) < 10.0

    def test_scale_invertible(self):
        x = np.linspace(-20, 10, 100)
        y = scale(x, -14.0, 6.0, -1.0, 1.0)
        x2 = scale(y, -1.0, 1.0, -14.0, 6.0)
        np.testing.assert_allclose(x, x2, atol=1e-12)
