"""The spectral frontend & synthesis library (SURVEY.md §2.2, S1–S11).

Pure, jittable ``jnp`` functions with static shapes — the single most
parity-critical component of the framework. Used in both directions:

- data direction (training): waveform -> (scaled log-mel-magnitude, mel-IF)
  "image" feeding the discriminator as the real sample;
- synthesis direction: generated mel-IF image -> phase accumulation ->
  inverse STFT -> waveform.

Conventions (from SURVEY.md; the reference mount was empty, so these are
the binding spec):

- 64000-sample waves are padded to 67072 samples (pad split per
  ``AudioConfig.pad_left_fraction``), framed with length 2048 / hop 512,
  windowed with a periodic Hann, rFFT'd to 1025 bins, and the DC bin is
  dropped -> a 128x1024 complex spectrogram.
- Instantaneous frequency is ``diff(unwrap(phase))/pi`` with the initial
  phase frame prepended so the time axis keeps its length; the inverse is
  ``cumsum(IF * pi)`` along time.
- The mel projection uses the heuristic pseudo-inverse from
  ``gansynth_tpu.ops.mel``; IF is recomputed AFTER projecting the unwrapped
  phase to mel (and after projecting back), not by projecting IF itself.
- The inverse STFT multiplies by the least-squares synthesis window and
  overlap-adds; reconstruction is exact (float tolerance) wherever the
  overlap is complete, i.e. everywhere except the outer ~frame_length
  samples, part of which land in the padding (SURVEY.md §7 hard-part 1).

All spectral math stays in float32 — the GAN may run bf16, the FFT path
must not (SURVEY.md §2.9).

Array layout: waves are ``[..., time]``; spectrograms are
``[..., frames, bins]``; "images" are ``[..., frames, bins, 2]`` with
channel 0 = scaled log-mel-magnitude and channel 1 = mel-IF.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gansynth_tpu.ops.mel import linear_to_mel_matrix, mel_to_linear_matrix
from gansynth_tpu.ops.windows import hann_window, inverse_stft_window
from gansynth_tpu.utils.config import AudioConfig, scale

_PI = np.pi


# ---------------------------------------------------------------------------
# S3/S4/S5: diff / unwrap / instantaneous frequency
# ---------------------------------------------------------------------------

def diff(x: jax.Array, axis: int = -2) -> jax.Array:
    """Finite difference along ``axis`` (length shrinks by one). S3."""
    n = x.shape[axis]
    return jax.lax.slice_in_dim(x, 1, n, axis=axis) - jax.lax.slice_in_dim(
        x, 0, n - 1, axis=axis
    )


def unwrap(phase: jax.Array, axis: int = -2, discont: float = _PI) -> jax.Array:
    """Phase unwrapping along ``axis`` with numpy.unwrap semantics. S4.

    Accumulates +-2*pi corrections wherever the frame-to-frame phase jump
    exceeds ``discont``; jumps of exactly -pi with a positive raw difference
    are mapped to +pi (numpy's tie-break), keeping the op an exact oracle
    match with ``np.unwrap``.
    """
    dd = diff(phase, axis=axis)
    ddmod = jnp.mod(dd + _PI, 2.0 * _PI) - _PI
    ddmod = jnp.where((ddmod == -_PI) & (dd > 0), _PI, ddmod)
    ph_correct = ddmod - dd
    ph_correct = jnp.where(jnp.abs(dd) < discont, 0.0, ph_correct)
    corrections = jnp.cumsum(ph_correct, axis=axis)
    pad = [(0, 0)] * phase.ndim
    pad[axis if axis >= 0 else phase.ndim + axis] = (1, 0)
    return phase + jnp.pad(corrections, pad)


def instantaneous_frequency(phase: jax.Array, axis: int = -2) -> jax.Array:
    """IF in [-1, 1]: time-diff of unwrapped phase over pi, shape-preserving. S5.

    The first frame of the unwrapped phase is prepended to the diff so the
    time axis keeps its length; the exact inverse is
    ``cumsum(IF * pi, axis)`` (used by :func:`melspecgrams_to_specgrams`
    and the synthesis path).

    Computed WITHOUT materializing the unwrap: the unwrap corrections form
    a cumsum that cancels exactly in the diff —
    ``diff(unwrap(p))[t] = dd[t] + ph_correct[t] = where(|dd|<pi, dd,
    ddmod)[t]`` — so IF is a pure elementwise+shift computation (no scan),
    which XLA fuses into a single kernel. ``unwrap(p)[0] == p[0]`` supplies
    the initial row. Semantics are pinned to np.unwrap by the tests.
    """
    dd = diff(phase, axis=axis)
    ddmod = jnp.mod(dd + _PI, 2.0 * _PI) - _PI
    ddmod = jnp.where((ddmod == -_PI) & (dd > 0), _PI, ddmod)
    dphase = jnp.where(jnp.abs(dd) < _PI, dd, ddmod)
    initial = jax.lax.slice_in_dim(phase, 0, 1, axis=axis)
    return jnp.concatenate([initial, dphase], axis=axis) / _PI


def polar_to_rect(magnitude: jax.Array, phase: jax.Array) -> jax.Array:
    """mag * e^{i*phase} as complex64."""
    mag = magnitude.astype(jnp.float32)
    return jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))


# ---------------------------------------------------------------------------
# S1/S10: framing, STFT, overlap-add, inverse STFT
# ---------------------------------------------------------------------------

def frame_signal(wave: jax.Array, frame_length: int, frame_step: int) -> jax.Array:
    """[..., samples] -> [..., frames, frame_length] strided framing.

    ``frames = (samples - frame_length) // frame_step + 1``; the trailing
    remainder (if any) is dropped, matching standard STFT framing.

    TPU-friendly lowering: when ``frame_step`` divides ``frame_length``
    (the 75%-overlap production geometry), frame t's j-th hop-chunk is
    ``wave[(t+j)*hop : (t+j+1)*hop]`` — so the whole framing is
    ``overlap`` shifted contiguous reshapes concatenated on the last axis.
    No gather, no scatter; XLA turns it into cheap copies. Falls back to a
    gather for non-dividing geometries.
    """
    samples = wave.shape[-1]
    num_frames = (samples - frame_length) // frame_step + 1
    if frame_length % frame_step == 0:
        overlap = frame_length // frame_step
        chunks = []
        for j in range(overlap):
            seg = jax.lax.slice_in_dim(
                wave, j * frame_step, (j + num_frames) * frame_step, axis=-1
            )
            chunks.append(
                seg.reshape(wave.shape[:-1] + (num_frames, frame_step))
            )
        return jnp.concatenate(chunks, axis=-1)
    idx = (
        np.arange(num_frames, dtype=np.int32)[:, None] * frame_step
        + np.arange(frame_length, dtype=np.int32)[None, :]
    )
    return wave[..., idx]


def overlap_add(frames: jax.Array, frame_step: int) -> jax.Array:
    """[..., frames, frame_length] -> [..., samples] overlap-add.

    Inverse of :func:`frame_signal`'s layout. Same reshape trick in
    reverse when ``frame_step`` divides ``frame_length``: the j-th
    hop-chunk column of all frames is one contiguous [frames*hop] run
    starting at offset ``j*hop`` — overlap-add is ``overlap`` shifted
    pads summed together. No scatter. Gather-free fallback otherwise.
    """
    num_frames, frame_length = frames.shape[-2], frames.shape[-1]
    samples = (num_frames - 1) * frame_step + frame_length
    if frame_length % frame_step == 0:
        overlap = frame_length // frame_step
        lead = frames.shape[:-2]
        out = jnp.zeros(lead + (samples,), dtype=frames.dtype)
        for j in range(overlap):
            chunk = jax.lax.slice_in_dim(
                frames, j * frame_step, (j + 1) * frame_step, axis=-1
            ).reshape(lead + (num_frames * frame_step,))
            pad = [(0, 0)] * len(lead) + [
                (j * frame_step, samples - j * frame_step - num_frames * frame_step)
            ]
            out = out + jnp.pad(chunk, pad)
        return out
    idx = (
        np.arange(num_frames, dtype=np.int32)[:, None] * frame_step
        + np.arange(frame_length, dtype=np.int32)[None, :]
    )
    out = jnp.zeros(frames.shape[:-2] + (samples,), dtype=frames.dtype)
    return out.at[..., idx].add(frames)


@functools.partial(jax.jit, static_argnames=("config",))
def stft(wave: jax.Array, config: AudioConfig = AudioConfig()) -> jax.Array:
    """S1: [..., 64000] float wave -> [..., 128, 1024] complex spectrogram.

    Pads to ``config.padded_length``, frames, applies a periodic Hann
    window, rFFTs, and drops the DC bin (``config.discard_dc``).
    """
    if wave.shape[-1] != config.audio_length:
        raise ValueError(
            f"expected waves of {config.audio_length} samples, got "
            f"{wave.shape[-1]} (config.audio_length drives the frame count)"
        )
    wave = wave.astype(jnp.float32)
    pad = [(0, 0)] * (wave.ndim - 1) + [(config.pad_left, config.pad_right)]
    wave = jnp.pad(wave, pad)
    frames = frame_signal(wave, config.frame_length, config.frame_step)
    if config.dft_mode == "matmul":
        a, b = _dft_matrices(config)
        spec = jax.lax.complex(frames @ a, frames @ b)  # window folded in
    else:
        window = jnp.asarray(hann_window(config.frame_length))
        spec = jnp.fft.rfft(frames * window, axis=-1)
    if config.discard_dc:
        spec = spec[..., 1:]
    else:
        spec = spec[..., :-1]
    return spec


def _dft_matrices(config: AudioConfig):
    """Real forward-rDFT analysis matrices with the Hann window folded in.

    ``spec = frames @ A + i * (frames @ B)`` over all ``N/2+1`` bins equals
    ``rfft(frames * hann)``: A[n,k] = w[n] cos(2 pi k n / N),
    B[n,k] = -w[n] sin(2 pi k n / N). f64 at trace time, f32 constants.
    """
    n = config.frame_length
    bins = config.num_rfft_bins
    t = np.arange(n)[:, None].astype(np.float64)
    k = np.arange(bins)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * t / n
    w = hann_window(n).astype(np.float64)[:, None]
    a = (w * np.cos(ang)).astype(np.float32)
    b = (-w * np.sin(ang)).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b)


def _idft_matrices(config: AudioConfig):
    """Real iDFT synthesis matrices with the synthesis window folded in.

    ``frames = Re(S) @ C + Im(S) @ D`` over the full ``n_bins = N/2 + 1``
    rFFT bins reproduces ``irfft(S) * synthesis_window`` exactly:

        x[n] = (1/N) [X0 + 2 sum_{k=1}^{N/2-1} (ReXk cos - ImXk sin) +
                      X_{N/2} cos(pi n)]

    (the Nyquist row's imaginary part is ignored, matching irfft). Built
    in float64 at trace time, baked as f32 constants (~17 MB) — the iDFT
    becomes two MXU matmuls instead of an XLA FFT, which is the faster
    lowering on TPU.
    """
    n = config.frame_length
    bins = config.num_rfft_bins
    k = np.arange(bins)[:, None].astype(np.float64)
    t = np.arange(n)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * t / n
    coef = np.full((bins, 1), 2.0)
    coef[0, 0] = 1.0
    coef[-1, 0] = 1.0
    c = coef * np.cos(ang) / n
    d = -coef * np.sin(ang) / n
    d[0, :] = 0.0
    d[-1, :] = 0.0  # irfft ignores Im at DC and Nyquist
    w = inverse_stft_window(
        hann_window(config.frame_length), config.frame_step
    ).astype(np.float64)
    return jnp.asarray((c * w).astype(np.float32)), jnp.asarray(
        (d * w).astype(np.float32)
    )


@functools.partial(jax.jit, static_argnames=("config",))
def istft(spec: jax.Array, config: AudioConfig = AudioConfig()) -> jax.Array:
    """S10 tail: [..., 128, 1024] complex -> [..., 64000] float wave.

    Re-inserts a zero bin where :func:`stft` dropped one, inverse-DFTs
    each frame (XLA FFT or windowed MXU matmuls per ``config.idft_mode``),
    applies the least-squares synthesis window, overlap-adds, and crops
    the padding back off.
    """
    pad = [(0, 0)] * (spec.ndim - 1)
    if config.discard_dc:
        spec = jnp.pad(spec, pad + [(1, 0)])
    else:
        spec = jnp.pad(spec, pad + [(0, 1)])
    if config.idft_mode == "matmul":
        c, d = _idft_matrices(config)
        frames = jnp.real(spec) @ c + jnp.imag(spec) @ d  # window folded in
    else:
        window = jnp.asarray(
            inverse_stft_window(hann_window(config.frame_length), config.frame_step)
        )
        frames = jnp.fft.irfft(spec, n=config.frame_length, axis=-1) * window
    wave = overlap_add(frames, config.frame_step)
    return jax.lax.slice_in_dim(
        wave, config.pad_left, config.pad_left + config.audio_length, axis=-1
    )


# ---------------------------------------------------------------------------
# S8/S9: specgrams <-> melspecgrams
# ---------------------------------------------------------------------------

def _mel_matrices(config: AudioConfig):
    l2m = linear_to_mel_matrix(
        num_mel_bins=config.num_mel_bins,
        num_spectrogram_bins=config.num_freq_bins,
        sample_rate=config.sample_rate,
        lower_edge_hertz=config.mel_lower_hertz,
        upper_edge_hertz=config.mel_upper_hertz,
    )
    return jnp.asarray(l2m), jnp.asarray(mel_to_linear_matrix(l2m))


@functools.partial(jax.jit, static_argnames=("config",))
def specgrams_to_melspecgrams(
    logmag: jax.Array, ifreq: jax.Array, config: AudioConfig = AudioConfig()
):
    """S8: (log-magnitude, IF) on linear bins -> (log-mel-mag^2, mel-IF).

    Magnitudes travel through mel as POWER (mag^2 @ M); phase travels as the
    accumulated phase angle projected through M, with IF recomputed after
    projection (SURVEY.md §2.2 S8).
    """
    l2m, _ = _mel_matrices(config)
    mag2 = jnp.exp(2.0 * logmag)
    logmelmag2 = jnp.log(mag2 @ l2m + config.logmel_eps)
    phase = jnp.cumsum(ifreq * _PI, axis=-2)
    mel_phase = phase @ l2m
    mel_ifreq = instantaneous_frequency(mel_phase, axis=-2)
    return logmelmag2, mel_ifreq


@functools.partial(jax.jit, static_argnames=("config",))
def melspecgrams_to_specgrams(
    logmelmag2: jax.Array, mel_ifreq: jax.Array, config: AudioConfig = AudioConfig()
):
    """S9: inverse of S8 through the heuristic mel pseudo-inverse (lossy)."""
    _, m2l = _mel_matrices(config)
    mag2 = jnp.exp(logmelmag2) @ m2l
    logmag = 0.5 * jnp.log(jnp.maximum(mag2, 0.0) + config.logmel_eps)
    mel_phase = jnp.cumsum(mel_ifreq * _PI, axis=-2)
    phase = mel_phase @ m2l
    ifreq = instantaneous_frequency(phase, axis=-2)
    return logmag, ifreq


# ---------------------------------------------------------------------------
# S2 + composites (S11): wave <-> specgrams <-> melspecgrams <-> image
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("config",))
def wave_to_specgrams(wave: jax.Array, config: AudioConfig = AudioConfig()):
    """wave -> (log-magnitude, IF) on linear frequency bins (S1+S2+S5)."""
    spec = stft(wave, config)
    logmag = jnp.log(jnp.abs(spec) + config.logmel_eps)
    phase = jnp.angle(spec)
    ifreq = instantaneous_frequency(phase, axis=-2)
    return logmag, ifreq


@functools.partial(jax.jit, static_argnames=("config",))
def specgrams_to_wave(
    logmag: jax.Array, ifreq: jax.Array, config: AudioConfig = AudioConfig()
):
    """(log-magnitude, IF) -> wave: phase cumsum, polar->rect, iSTFT (S10)."""
    mag = jnp.exp(logmag)
    phase = jnp.cumsum(ifreq * _PI, axis=-2)
    return istft(polar_to_rect(mag, phase), config)


@functools.partial(jax.jit, static_argnames=("config",))
def wave_to_melspecgrams(wave: jax.Array, config: AudioConfig = AudioConfig()):
    """S11 data direction: wave -> (log-mel-mag^2, mel-IF)."""
    logmag, ifreq = wave_to_specgrams(wave, config)
    return specgrams_to_melspecgrams(logmag, ifreq, config)


@functools.partial(jax.jit, static_argnames=("config",))
def melspecgrams_to_wave(
    logmelmag2: jax.Array, mel_ifreq: jax.Array, config: AudioConfig = AudioConfig()
):
    """S11 synthesis direction: (log-mel-mag^2, mel-IF) -> wave.

    Computed in algebraically simplified form (same function as
    ``specgrams_to_wave(*melspecgrams_to_specgrams(...))`` — asserted by
    tests — with two exact identities applied):

    - the IF roundtrip is the identity on phase:
      ``cumsum(instantaneous_frequency(p) * pi, time) == unwrap(p)``, and
    - ``cos``/``sin`` are 2*pi-periodic, so the unwrap corrections the
      intermediate IF recomputation introduces cannot change the complex
      spectrogram.

    The whole phase path therefore collapses to ONE cumsum + ONE mel
    matmul feeding cos/sin directly — no unwrap/diff/mod chain. Magnitude
    uses ``exp(0.5*log(x + eps)) == sqrt(x + eps)``.
    """
    _, m2l = _mel_matrices(config)
    mag2 = jnp.exp(logmelmag2) @ m2l
    mag = jnp.sqrt(jnp.maximum(mag2, 0.0) + config.logmel_eps)
    phase = jnp.cumsum(mel_ifreq * _PI, axis=-2) @ m2l
    return istft(polar_to_rect(mag, phase), config)


@functools.partial(jax.jit, static_argnames=("config",))
def wave_to_image(wave: jax.Array, config: AudioConfig = AudioConfig()) -> jax.Array:
    """wave [..., 64000] -> GAN image [..., 128, 1024, 2].

    Channel 0: log-mel-mag^2 linearly rescaled from
    [logmel_min, logmel_max] to [-1, 1] (the reference's fixed
    ``utils.scale`` map, SURVEY.md §2.2 S2). Channel 1: mel-IF (already in
    [-1, 1]).
    """
    logmelmag2, mel_ifreq = wave_to_melspecgrams(wave, config)
    ch0 = scale(logmelmag2, config.logmel_min, config.logmel_max, -1.0, 1.0)
    return jnp.stack([ch0, mel_ifreq], axis=-1)


@functools.partial(jax.jit, static_argnames=("config",))
def image_to_wave(image: jax.Array, config: AudioConfig = AudioConfig()) -> jax.Array:
    """GAN image [..., 128, 1024, 2] -> wave [..., 64000] (synthesis path)."""
    if image.shape[-1] != 2:
        raise ValueError(
            f"expected a 2-channel (log-mel-mag, mel-IF) image, got "
            f"{image.shape[-1]} channels"
        )
    kern = config.synthesis_kernel
    if kern == "auto":
        # Measured default (BENCH_r04 kernel matrix): the fused Pallas
        # spectrum kernel beats the XLA lowering on the flagship path
        # (7887x vs 7532x real-time per chip); compiled Pallas needs an
        # accelerator, so CPU resolves to the XLA lowering. Resolved at
        # trace time — the choice is baked into each compiled program.
        kern = "xla" if jax.default_backend() == "cpu" else "pallas"
    elif kern not in ("xla", "pallas"):
        raise ValueError(
            f"synthesis_kernel {kern!r} is not one of 'auto'/'xla'/'pallas'"
        )
    if kern == "pallas":
        from gansynth_tpu.kernels import synthesis_spectrum_pallas

        squeeze = image.ndim == 3
        if squeeze:
            image = image[None]
        re, im = synthesis_spectrum_pallas(image, config)
        wave = istft(jax.lax.complex(re, im), config)
        return wave[0] if squeeze else wave
    logmelmag2 = scale(
        image[..., 0], -1.0, 1.0, config.logmel_min, config.logmel_max
    )
    mel_ifreq = image[..., 1]
    return melspecgrams_to_wave(logmelmag2, mel_ifreq, config)
