"""STFT analysis/synthesis windows.

The synthesis window implements the standard least-squares inverse-STFT
window (Griffin & Lim): forward window divided by the hop-periodized sum of
squared windows. With a periodic Hann window at 75% overlap this makes
OLA(iFFT(FFT(frames * w)) * w_synth) an exact reconstruction in the fully
overlapped interior. Mirrors the behavior of ``tf.signal.hann_window`` /
``tf.signal.inverse_stft_window_fn`` which the reference relies on
(SURVEY.md §2.2 S1/S10); implemented from the algorithm, not ported.
"""

from __future__ import annotations

import numpy as np


def hann_window(length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window: 0.5 - 0.5*cos(2*pi*n/N), n = 0..N-1."""
    n = np.arange(length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / length)
    return w.astype(dtype)


def inverse_stft_window(
    forward_window: np.ndarray, frame_step: int, dtype=np.float32
) -> np.ndarray:
    """Least-squares synthesis window for OLA inverse STFT.

    Requires ``len(forward_window) % frame_step == 0``. For each position i
    within the window, divides by ``sum_k w[i mod hop + k*hop]^2`` — the
    periodized energy of the analysis window — so that overlap-adding
    ``frames * w_synth`` reconstructs the signal exactly wherever the
    overlap is complete.
    """
    frame_length = forward_window.shape[0]
    if frame_length % frame_step != 0:
        raise ValueError(
            f"frame_length ({frame_length}) must be a multiple of "
            f"frame_step ({frame_step})"
        )
    w = forward_window.astype(np.float64)
    overlaps = frame_length // frame_step
    denom = (w * w).reshape(overlaps, frame_step).sum(axis=0)
    denom = np.tile(denom, overlaps)
    # Guard against zero-energy positions (cannot happen for Hann at >=50%
    # overlap, but keep the formula total).
    safe = np.where(np.abs(denom) > 1e-30, denom, 1.0)
    return (w / safe).astype(dtype)
