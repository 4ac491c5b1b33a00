"""Pallas kernel equality tests (interpret mode on the CPU test mesh)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from gansynth_tpu.kernels import synthesis_spectrum_pallas
from gansynth_tpu.ops import image_to_wave, wave_to_image
from gansynth_tpu.utils.config import AudioConfig, scale

CFG = AudioConfig()


@pytest.fixture(scope="module")
def image(rng=None):
    rng = np.random.default_rng(42)
    t = np.arange(CFG.audio_length) / CFG.sample_rate
    wave = np.stack([
        np.sin(2 * np.pi * f * t) * np.exp(-t) for f in (261.6, 440.0)
    ]).astype(np.float32)
    return np.asarray(wave_to_image(jnp.asarray(wave), CFG))


def test_spectrum_matches_xla_path(image):
    re, im = synthesis_spectrum_pallas(jnp.asarray(image), CFG, interpret=True)
    assert re.shape == (2, 128, 1024)
    # XLA reference: the same math via the public ops
    logmelmag2 = scale(image[..., 0], -1.0, 1.0, CFG.logmel_min, CFG.logmel_max)
    from gansynth_tpu.ops.spectral import _mel_matrices

    _, m2l = _mel_matrices(CFG)
    mag = jnp.sqrt(
        jnp.maximum(jnp.exp(logmelmag2) @ m2l, 0.0) + CFG.logmel_eps
    )
    phase = jnp.cumsum(image[..., 1] * np.pi, axis=-2) @ m2l
    np.testing.assert_allclose(
        np.asarray(re), np.asarray(mag * jnp.cos(phase)), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(im), np.asarray(mag * jnp.sin(phase)), atol=2e-2
    )


def test_image_to_wave_pallas_mode_matches_xla(image):
    cfg_pl = dataclasses.replace(CFG, synthesis_kernel="pallas")
    # route the pallas path through interpret mode on CPU
    import gansynth_tpu.kernels as K

    orig = K.synthesis_spectrum_pallas
    K.synthesis_spectrum_pallas = lambda img, cfg: orig(img, cfg, interpret=True)
    try:
        w_pl = np.asarray(image_to_wave(jnp.asarray(image), cfg_pl))
    finally:
        K.synthesis_spectrum_pallas = orig
    w_xla = np.asarray(image_to_wave(jnp.asarray(image), CFG))
    assert w_pl.shape == w_xla.shape == (2, CFG.audio_length)
    # identical math, different op ordering: tight absolute agreement
    err = np.abs(w_pl - w_xla)
    assert err.max() < 5e-3, err.max()
    denom = np.sum(w_xla**2)
    snr = 10 * np.log10(denom / max(np.sum(err**2), 1e-30))
    assert snr > 40.0


def test_auto_kernel_resolves_to_xla_on_cpu(image):
    """The 'auto' default (BENCH_r04: pallas wins on the chip) resolves
    to the XLA lowering on CPU — bitwise-equal to an explicit 'xla'
    config, since it is the SAME traced program."""
    assert CFG.synthesis_kernel == "auto"
    cfg_xla = dataclasses.replace(CFG, synthesis_kernel="xla")
    w_auto = np.asarray(image_to_wave(jnp.asarray(image), CFG))
    w_xla = np.asarray(image_to_wave(jnp.asarray(image), cfg_xla))
    np.testing.assert_array_equal(w_auto, w_xla)
