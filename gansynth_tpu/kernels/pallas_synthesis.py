"""Pallas TPU kernel: fused mel-IF image -> complex synthesis spectrum.

Fuses the whole pre-iDFT synthesis chain of SURVEY.md §3.2 into ONE kernel
per batch element, keeping every intermediate in VMEM:

    ch0 -> un-scale -> exp -> @ mel_pinv -> sqrt            (magnitude)
    ch1 -> * pi -> time-cumsum -> @ mel_pinv                (phase)
    -> (mag * cos(phase), mag * sin(phase))                 (polar->rect)

The time cumsum is computed as a lower-triangular [T, T] matmul — a
128x128 MXU op — instead of a VPU scan. The mel pseudo-inverse (4 MB f32)
and the triangular matrix stay resident in VMEM across the whole grid
(their BlockSpec index map is constant, so Mosaic's pipeline does not
re-fetch them), so the kernel streams each batch element's two input
planes once and writes the two output planes once: the XLA lowering's
intermediate HBM round trips (mag, phase buffers) disappear.

The XLA path (`ops.spectral.melspecgrams_to_wave`) remains the reference
implementation; this kernel is selected via
``AudioConfig.synthesis_kernel = "pallas"`` and is equality-tested against
the XLA path (interpret mode on CPU, compiled on TPU).

Grid: (B,). VMEM budget per step: 2 weight matrices (~4.1 MB) + 4 data
planes of [128, 1024] f32 (~2 MB) + intermediates — comfortably inside
the ~16 MB/core VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gansynth_tpu.ops.mel import linear_to_mel_matrix, mel_to_linear_matrix
from gansynth_tpu.utils.config import AudioConfig

_PI = np.pi


def _make_kernel(config: AudioConfig):
    # Inverse of utils.scale(x, logmel_min, logmel_max, -1, 1):
    # lmm2 = (ch0 + 1) * (max - min) / 2 + min = ch0 * a + b
    a = (config.logmel_max - config.logmel_min) / 2.0
    b = (config.logmel_max + config.logmel_min) / 2.0
    eps = config.logmel_eps

    def kernel(ch0_ref, mif_ref, m2l_ref, tri_ref, re_ref, im_ref):
        lmm2 = ch0_ref[0] * a + b
        mag2 = jnp.dot(
            jnp.exp(lmm2), m2l_ref[:], preferred_element_type=jnp.float32
        )
        mag = jnp.sqrt(jnp.maximum(mag2, 0.0) + eps)
        # time cumsum as lower-triangular matmul: phase_mel[t] =
        # sum_{s<=t} mif[s] * pi
        phase_mel = jnp.dot(
            tri_ref[:], mif_ref[0] * _PI, preferred_element_type=jnp.float32
        )
        phase = jnp.dot(
            phase_mel, m2l_ref[:], preferred_element_type=jnp.float32
        )
        re_ref[0] = mag * jnp.cos(phase)
        im_ref[0] = mag * jnp.sin(phase)

    return kernel


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def synthesis_spectrum_pallas(
    image: jax.Array,
    config: AudioConfig = AudioConfig(),
    *,
    interpret: bool = False,
):
    """[B, T, M, 2] mel-IF image -> (Re, Im) linear spectrum [B, T, F].

    Equivalent to the magnitude/phase part of
    ``ops.spectral.melspecgrams_to_wave`` (before the iDFT); feed the
    result to ``ops.spectral.istft`` via ``lax.complex``.
    """
    batch, frames, mel_bins, _ = image.shape
    ch0 = image[..., 0]
    mif = image[..., 1]
    l2m = linear_to_mel_matrix(
        num_mel_bins=config.num_mel_bins,
        num_spectrogram_bins=config.num_freq_bins,
        sample_rate=config.sample_rate,
        lower_edge_hertz=config.mel_lower_hertz,
        upper_edge_hertz=config.mel_upper_hertz,
    )
    m2l = jnp.asarray(mel_to_linear_matrix(l2m))
    tri = jnp.asarray(np.tril(np.ones((frames, frames), np.float32)))

    plane = pl.BlockSpec(
        (1, frames, mel_bins), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    weight = lambda shape: pl.BlockSpec(
        shape, lambda b: (0, 0), memory_space=pltpu.VMEM
    )
    out_plane = pl.BlockSpec(
        (1, frames, config.num_freq_bins),
        lambda b: (b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(
        (batch, frames, config.num_freq_bins), jnp.float32
    )
    re, im = pl.pallas_call(
        _make_kernel(config),
        grid=(batch,),
        in_specs=[
            plane,
            plane,
            weight((config.num_mel_bins, config.num_freq_bins)),
            weight((frames, frames)),
        ],
        out_specs=(out_plane, out_plane),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(ch0, mif, m2l, tri)
    return re, im
