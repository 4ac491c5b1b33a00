"""Linear-frequency <-> mel-frequency projection matrices.

``linear_to_mel_matrix`` reproduces the algorithm of
``tf.signal.linear_to_mel_weight_matrix`` (triangular filters on the HTK
mel scale, first ``bands_to_zero=1`` spectrogram bins zeroed), which the
reference's spectral layer uses for its 1024-mel high-frequency-resolution
projection (SURVEY.md §2.2 S6). The matrices are computed in numpy float64
at trace time and baked into the jitted graph as constants — there is no
reason to compute them on device.

``mel_to_linear_matrix`` is the reference's heuristic pseudo-inverse
(SURVEY.md §2.2 S7): ``Mᵀ · diag(d)`` with ``d_j = 1 / Σ_i (M Mᵀ)_{ij}``.
It is NOT an exact inverse; the mel roundtrip is lossy by design.

Quirk preserved deliberately: the frontend drops the DC bin before the mel
projection, but the matrix is built for ``num_spectrogram_bins`` bins laid
out on ``linspace(0, nyquist, num_spectrogram_bins)`` — i.e. the grid is
interpreted as if bin 0 were DC. The upstream pipeline this reference
follows has the same off-by-one-bin frequency interpretation; we keep it
for output parity.
"""

from __future__ import annotations

import numpy as np


def _hertz_to_mel(f, break_hertz: float = 700.0, break_mels: float = 1127.0):
    """HTK mel scale: 1127 * ln(1 + f/700). (2595*log10 form, natural-log units.)"""
    return break_mels * np.log1p(np.asarray(f, dtype=np.float64) / break_hertz)


def linear_to_mel_matrix(
    num_mel_bins: int = 1024,
    num_spectrogram_bins: int = 1024,
    sample_rate: float = 16000.0,
    lower_edge_hertz: float = 0.0,
    upper_edge_hertz: float = 8000.0,
    dtype=np.float32,
) -> np.ndarray:
    """[num_spectrogram_bins, num_mel_bins] triangular mel filterbank."""
    bands_to_zero = 1
    nyquist = sample_rate / 2.0
    linear_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)[bands_to_zero:]
    spectrogram_bins_mel = _hertz_to_mel(linear_freqs)[:, np.newaxis]

    # num_mel_bins + 2 edges, framed into overlapping (lower, center, upper).
    band_edges_mel = np.linspace(
        _hertz_to_mel(lower_edge_hertz),
        _hertz_to_mel(upper_edge_hertz),
        num_mel_bins + 2,
    )
    lower_edge_mel = band_edges_mel[np.newaxis, 0:-2]
    center_mel = band_edges_mel[np.newaxis, 1:-1]
    upper_edge_mel = band_edges_mel[np.newaxis, 2:]

    lower_slopes = (spectrogram_bins_mel - lower_edge_mel) / (
        center_mel - lower_edge_mel
    )
    upper_slopes = (upper_edge_mel - spectrogram_bins_mel) / (
        upper_edge_mel - center_mel
    )
    weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))
    weights = np.pad(weights, [[bands_to_zero, 0], [0, 0]])
    return weights.astype(dtype)


def mel_to_linear_matrix(mel_matrix: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Heuristic pseudo-inverse [num_mel_bins, num_spectrogram_bins].

    ``Mᵀ @ diag(d)`` with ``d = 1 / colsum(M @ Mᵀ)`` (entries with
    |colsum| <= 1e-8 are passed through unscaled, matching the guard in the
    upstream formula). SURVEY.md §2.2 S7.
    """
    m = np.asarray(mel_matrix, dtype=np.float64)
    m_t = m.T
    p = m @ m_t
    sums = p.sum(axis=0)
    d = np.where(np.abs(sums) > 1e-8, 1.0 / np.where(sums == 0, 1.0, sums), sums)
    return (m_t * d[np.newaxis, :]).astype(dtype)
