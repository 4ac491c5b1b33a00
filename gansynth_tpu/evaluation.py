"""Evaluation metrics for pitch-conditional synthesis.

The reference ships no quantitative evaluation (SURVEY.md §4: verification
was visual/auditory inspection); these host-side metrics give the rebuild
an objective readout of the property the model is conditioned on:

- ``detect_midi_pitch`` — fundamental-frequency estimate via the harmonic
  product spectrum (robust to energy living in the harmonics), mapped to
  MIDI.
- ``pitch_accuracy`` — fraction of generated notes whose detected pitch
  lands within a semitone tolerance of the conditioning label.
- ``log_spectral_distance`` — mean L2 distance between log-magnitude
  spectrograms of two audio batches (a coarse distributional check
  against real data).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def detect_midi_pitch(
    wave: np.ndarray,
    sample_rate: int = 16000,
    *,
    num_harmonics: int = 5,
    fmin: float = 20.0,
    fmax: float = 2000.0,
    octave_correction: bool = True,
    subharmonic_evidence: float = 0.1,
) -> float:
    """Estimate the fundamental as MIDI via a 1/h-weighted harmonic sum
    with an explicit octave-down decision step.

    ``score(f) = sum_h |S(h*f)| / h`` over linear magnitudes. Unlike the
    log-domain harmonic product spectrum, this cannot prefer a
    subharmonic of a sparse stack: every term a candidate f0/k collects is
    a true-harmonic magnitude discounted by a deeper 1/h weight, so the
    true f0 strictly dominates, and missing high harmonics contribute ~0
    (linear noise) instead of a -inf-ish log penalty.

    The raw argmax still errs OCTAVE-UP whenever the 2nd harmonic
    dominates the fundamental: candidate 2*f0 keeps the biggest partial
    at weight 1 while f0 holds it at 1/2, so ``S(2f0) > S(f0) +
    S(3f0)/3 + ...`` flips the ranking even with a clearly audible
    fundamental (round-4 flagship: the HPS-only 7.2% disagreement was
    exactly this). The correction inspects each subharmonic candidate
    ``f*/k`` (k=2,3) for evidence UNIQUE to it — magnitude at harmonics
    ``h*f*/k`` with ``h % k != 0``, bins a true note at f* leaves at the
    noise floor — and steps down while that evidence exceeds
    ``subharmonic_evidence`` of the winning score. Genuinely ambiguous
    stacks (energy ONLY at multiples of 2*f0) have zero unique evidence
    and correctly stay at the upper octave.
    """
    wave = np.asarray(wave, np.float64).reshape(-1)
    n = wave.size
    spec = np.abs(np.fft.rfft(wave * np.hanning(n)))
    score = spec.copy()
    for h in range(2, num_harmonics + 1):
        decimated = spec[::h] / h
        score[: decimated.size] += decimated
    freqs = np.fft.rfftfreq(n, 1.0 / sample_rate)
    band = (freqs >= fmin) & (freqs <= fmax)
    band_idx = np.nonzero(band)[0]
    bin_hz = sample_rate / n

    def mag_at(freq: float) -> float:
        """Local-max magnitude around ``freq`` (absorbs window leakage)."""
        k = int(round(freq / bin_hz))
        if k < 1 or k >= spec.size - 2:
            return 0.0
        return float(spec[max(k - 2, 0) : k + 3].max())

    peak = int(band_idx[np.argmax(score[band_idx])])
    f0 = float(freqs[peak])
    if octave_correction:
        for _ in range(3):  # at most a few octaves of correction
            shifted = False
            for k in (2, 3):
                cand = f0 / k
                if cand < fmin:
                    continue
                unique = sum(
                    mag_at(cand * h) / h
                    for h in range(1, k * num_harmonics + 1)
                    if h % k != 0
                )
                if unique >= subharmonic_evidence * score[peak]:
                    f0 = cand
                    shifted = True
                    break
            if not shifted:
                break
    return 69.0 + 12.0 * np.log2(max(f0, 1e-6) / 440.0)


def detect_midi_pitch_cepstrum(
    wave: np.ndarray,
    sample_rate: int = 16000,
    *,
    fmin: float = 27.5,
    fmax: float = 1200.0,
) -> float:
    """Fundamental estimate via the real cepstrum's peak quefrency.

    Third INDEPENDENT detector (VERDICT-r4 item 5): the cepstrum reads
    periodicity from the log-magnitude spectrum's ripple, so its failure
    modes differ from both the linear-magnitude harmonic sum (octave-up
    under a dominant 2nd harmonic) and the time-domain autocorrelation
    (subharmonics of near-integer period multiples). Agreement across
    all three is about as close to ground truth as a signal-side f0 can
    get.

    Domain limits, measured on the synthetic sparse-harmonic matrix
    (tests/test_evaluation.py): cepstral pitch reads HARMONIC SPACING,
    so a single-partial signal has no quefrency peak — the detector
    returns NaN for those (guard below) instead of a window artifact;
    and broadband noise shallows the log-spectral ripple, making this
    the least noise-robust of the three (diagnostic vote, not the
    headline metric). The log dynamic range is clamped at 1e-3 of the
    spectral peak so the depth of the inter-harmonic noise floor cannot
    masquerade as ripple amplitude, and — like the ACF — the shortest
    strong 'rahmonic' submultiple wins over the global argmax."""
    wave = np.asarray(wave, np.float64).reshape(-1)
    wave = wave - wave.mean()
    n = wave.size
    spec = np.abs(np.fft.rfft(wave * np.hanning(n)))
    peak = float(spec.max())
    if peak <= 0:
        return float("nan")
    # Single-partial guard: count well-separated spectral peaks above 5%
    # of the maximum (Hann sidelobes sit at ~2.8%, safely below).
    is_max = (
        (spec[1:-1] > spec[:-2])
        & (spec[1:-1] >= spec[2:])
        & (spec[1:-1] > 0.05 * peak)
    )
    idx = np.nonzero(is_max)[0] + 1
    distinct, last = 0, -10**9
    for i in idx:
        if i - last >= 8:
            distinct += 1
            last = int(i)
    if distinct < 2:
        return float("nan")
    ceps = np.fft.irfft(np.log(np.maximum(spec, 1e-3 * peak)))
    q_min = max(int(sample_rate / fmax), 2)
    q_max = min(int(sample_rate / fmin), n // 2 - 2)
    if q_max <= q_min:
        return float("nan")

    def refined(lag):
        # Clamp to the band: the spectral-envelope ramp below q_min is
        # monotone and would otherwise drag the parabolic walk off the
        # band edge (measured: low-pitch GAN notes pegged at q_min-2).
        lo, hi = max(lag - 2, q_min), min(lag + 3, q_max)
        k = lo + int(np.argmax(ceps[lo:hi]))
        a, b, c = ceps[k - 1], ceps[k], ceps[k + 1]
        denom = a - 2 * b + c
        shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
        shift = float(np.clip(shift, -1, 1))
        return float(b - 0.25 * (a - c) * shift), k + shift

    # The quefrency peak must be a LOCAL maximum: the band-edge argmax
    # of the envelope ramp is not a pitch reading. Prefer the highest
    # interior local max; fall back to the raw argmax only if none.
    band = ceps[q_min:q_max]
    interior = (
        (band[1:-1] > band[:-2]) & (band[1:-1] >= band[2:])
    )
    locs = np.nonzero(interior)[0] + 1
    if locs.size:
        q0 = q_min + int(locs[np.argmax(band[locs])])
    else:
        q0 = q_min + int(np.argmax(band))
    best_val, best_pos = refined(q0)
    for k in range(8, 1, -1):
        cand = int(round(best_pos / k))
        if cand < q_min:
            continue
        val, pos = refined(cand)
        if val >= 0.7 * best_val and abs(pos * k - best_pos) < 0.08 * best_pos:
            best_val, best_pos = val, pos
            break
    f0 = sample_rate / best_pos
    return 69.0 + 12.0 * np.log2(max(f0, 1e-6) / 440.0)


def detect_midi_pitch_acf(
    wave: np.ndarray,
    sample_rate: int = 16000,
    *,
    fmin: float = 27.5,
    fmax: float = 2000.0,
) -> float:
    """Fundamental estimate via the normalized autocorrelation peak.

    Independent failure modes from the harmonic-sum detector
    (:func:`detect_midi_pitch`): ACF errs toward SUBharmonics (period
    multiples score highly) where harmonic summation errs toward
    harmonics — agreement between the two is strong evidence the
    detected pitch is the true f0, and their disagreement pattern
    separates model octave errors from metric artifacts.
    """
    wave = np.asarray(wave, np.float64).reshape(-1)
    wave = wave - wave.mean()
    n = wave.size
    spec = np.fft.rfft(wave, 2 * n)
    r = np.fft.irfft(spec * np.conj(spec))[:n]
    if r[0] <= 0:
        return float("nan")
    r /= r[0]
    lag_min = max(int(sample_rate / fmax), 2)
    lag_max = min(int(sample_rate / fmin), n - 2)

    def refined(lag):
        """(interpolated peak value, interpolated lag) near ``lag``."""
        lo = max(lag - 2, 1)
        hi = min(lag + 3, n - 1)
        k = lo + int(np.argmax(r[lo:hi]))
        a, b, c = r[k - 1], r[k], r[k + 1]
        denom = a - 2 * b + c
        shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
        shift = float(np.clip(shift, -1, 1))
        return float(b - 0.25 * (a - c) * shift), k + shift

    # The zero-lag ridge (envelope correlation) decays slowly for
    # low-pitched content and would win argmax; search only past the
    # first negative excursion of r (always < the true period: the
    # fundamental's cosine term crosses zero at T/4).
    neg = np.nonzero(r[:lag_max] < 0)[0]
    start = max(lag_min, int(neg[0])) if neg.size else lag_min
    best_lag = start + int(np.argmax(r[start:lag_max]))
    best_val, best_pos = refined(best_lag)
    # Submultiple correction: a period MULTIPLE whose peak lands closer
    # to an integer lag can out-sample the true period, so compare
    # INTERPOLATED peak heights at best/k and take the shortest strong,
    # phase-consistent one.
    for k in range(8, 1, -1):
        cand = int(round(best_pos / k))
        if cand < max(lag_min, 2):
            continue
        val, pos = refined(cand)
        if val >= 0.85 * best_val and abs(pos * k - best_pos) < 0.05 * best_pos:
            best_val, best_pos = val, pos
            break
    f0 = sample_rate / best_pos
    return 69.0 + 12.0 * np.log2(max(f0, 1e-6) / 440.0)


def pitch_accuracy(
    waves: np.ndarray,
    pitches: Sequence[int],
    sample_rate: int = 16000,
    *,
    tolerance_semitones: float = 0.5,
) -> Dict[str, float]:
    """Detected-vs-conditioned pitch agreement over a batch of notes.

    Reports the harmonic-sum detector as the primary metric plus the
    autocorrelation cross-check (``*_acf``) and the accuracy under the
    per-note BEST of the two (``pitch_accuracy_either``) — an upper
    bound that discounts single-detector octave artifacts.
    """
    waves = np.asarray(waves)
    detected = np.array([detect_midi_pitch(w, sample_rate) for w in waves])
    detected_acf = np.array(
        [detect_midi_pitch_acf(w, sample_rate) for w in waves]
    )
    detected_cep = np.array(
        [detect_midi_pitch_cepstrum(w, sample_rate) for w in waves]
    )
    target = np.asarray(pitches, np.float64)
    err = np.abs(detected - target)
    err_acf = np.abs(detected_acf - target)
    err_cep = np.abs(detected_cep - target)  # NaN where undefined
    err_best = np.fmin(err, err_acf)
    cep_defined = np.isfinite(err_cep)
    out = {
        "pitch_accuracy": float(np.mean(err <= tolerance_semitones)),
        "pitch_mae_semitones": float(np.mean(err)),
        "pitch_median_error_semitones": float(np.median(err)),
        "pitch_accuracy_acf": float(np.mean(err_acf <= tolerance_semitones)),
        "pitch_median_error_acf": float(np.median(err_acf)),
        "pitch_accuracy_either": float(
            np.mean(err_best <= tolerance_semitones)
        ),
        "pitch_mae_either": float(np.mean(err_best)),
        # Diagnostic third vote; accuracy over the notes where cepstral
        # pitch is DEFINED (>=2 spectral partials), with its coverage.
        "pitch_accuracy_cepstrum": float(
            np.mean(err_cep[cep_defined] <= tolerance_semitones)
        ) if cep_defined.any() else float("nan"),
        "pitch_cepstrum_coverage": float(np.mean(cep_defined)),
    }
    return out


def wilson_interval(successes: int, n: int, z: float = 1.96):
    """95% (default) Wilson score interval for a binomial proportion —
    the error bar the headline accuracy claims carry (VERDICT r2 weak
    item 1: n=122 gave ±~3% that the claims ignored)."""
    if n == 0:
        return (0.0, 1.0)
    p = successes / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = (
        z * np.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n)) / denom
    )
    return (float(center - half), float(center + half))


def pitch_attribution(
    waves: np.ndarray,
    pitches: Sequence[int],
    sample_rate: int = 16000,
    *,
    tolerance_semitones: float = 0.5,
) -> Dict:
    """Per-note failure attribution for the pitch-fidelity eval.

    The two detectors have OPPOSITE octave-failure modes (harmonic-sum
    errs toward harmonics, autocorrelation toward subharmonics), so
    their agreement pattern separates model errors from metric
    artifacts:

    - one detector fails, the other agrees with the label -> detector
      artifact (counted per detector);
    - BOTH fail -> model error, sub-classified by direction: octave_up /
      octave_down (within 0.6 st of a +/-12k jump) or other.

    Returns aggregate accuracies with 95% Wilson CIs, the attribution
    counts, a per-register breakdown (low/mid/high thirds of the 24-84
    range), and a per-pitch table.
    """
    waves = np.asarray(waves)
    target = np.asarray(pitches, np.float64)
    det_h = np.array([detect_midi_pitch(w, sample_rate) for w in waves])
    det_a = np.array(
        [detect_midi_pitch_acf(w, sample_rate) for w in waves]
    )
    det_c = np.array(
        [detect_midi_pitch_cepstrum(w, sample_rate) for w in waves]
    )
    err_h = np.abs(det_h - target)
    err_a = np.abs(det_a - target)
    err_c = np.abs(det_c - target)
    ok_h = err_h <= tolerance_semitones
    ok_a = err_a <= tolerance_semitones
    ok_c = err_c <= tolerance_semitones  # False where cepstrum undefined
    cep_defined = np.isfinite(err_c)
    n = len(target)

    both_fail = ~ok_h & ~ok_a
    modes = {"octave_up": 0, "octave_down": 0, "other": 0}
    for i in np.nonzero(both_fail)[0]:
        # attribute by the detector closer to an exact octave jump
        best_dir = "other"
        for det in (det_h[i], det_a[i]):
            delta = det - target[i]
            k = round(delta / 12.0)
            if k != 0 and abs(delta - 12.0 * k) <= 0.6:
                best_dir = "octave_up" if k > 0 else "octave_down"
                break
        modes[best_dir] += 1

    def region(p):
        if p < 44:
            return "low_24_43"
        if p < 64:
            return "mid_44_63"
        return "high_64_84"

    by_region: Dict[str, Dict] = {}
    for i, p in enumerate(target):
        r = by_region.setdefault(
            region(p), {"n": 0, "ok_either": 0, "both_fail": 0}
        )
        r["n"] += 1
        r["ok_either"] += int(ok_h[i] or ok_a[i])
        r["both_fail"] += int(both_fail[i])
    for r in by_region.values():
        r["accuracy_either"] = r["ok_either"] / r["n"]
        r["ci95_either"] = wilson_interval(r["ok_either"], r["n"])

    per_pitch: Dict[int, Dict] = {}
    for i, p in enumerate(target):
        row = per_pitch.setdefault(
            int(p), {"n": 0, "ok_hps": 0, "ok_acf": 0, "ok_either": 0,
                     "errs": []}
        )
        row["n"] += 1
        row["ok_hps"] += int(ok_h[i])
        row["ok_acf"] += int(ok_a[i])
        row["ok_either"] += int(ok_h[i] or ok_a[i])
        row["errs"].append(float(min(err_h[i], err_a[i])))
    for row in per_pitch.values():
        row["median_err_best"] = float(np.median(row.pop("errs")))

    # Per-note evidence for every disagreement (VERDICT-r4 item 5): the
    # committed eval JSON shows, note by note, WHICH detector deviated
    # and where the other two landed — the raw material for calling a
    # miss a detector artifact (others agree with the label) vs a model
    # error (all fail together). Capped to keep reports readable.
    disagree = np.nonzero(~ok_h | ~ok_a | (cep_defined & ~ok_c))[0]
    disagreements = [
        {
            "index": int(i),
            "pitch": int(target[i]),
            "hps": round(float(det_h[i]), 2),
            "acf": round(float(det_a[i]), 2),
            "cepstrum": (
                round(float(det_c[i]), 2) if cep_defined[i] else None
            ),
        }
        for i in disagree[:64]
    ]

    n_cep = int(cep_defined.sum())
    return {
        "n": n,
        "tolerance_semitones": tolerance_semitones,
        "accuracy_hps": float(np.mean(ok_h)),
        "ci95_hps": wilson_interval(int(ok_h.sum()), n),
        "accuracy_acf": float(np.mean(ok_a)),
        "ci95_acf": wilson_interval(int(ok_a.sum()), n),
        "accuracy_cepstrum": (
            float(ok_c[cep_defined].mean()) if n_cep else float("nan")
        ),
        "ci95_cepstrum": wilson_interval(int(ok_c.sum()), max(n_cep, 1)),
        "cepstrum_coverage": n_cep / n if n else 0.0,
        "accuracy_either": float(np.mean(ok_h | ok_a)),
        "ci95_either": wilson_interval(int((ok_h | ok_a).sum()), n),
        "failures": {
            "hps_only": int((~ok_h & ok_a).sum()),
            "acf_only": int((ok_h & ~ok_a).sum()),
            "both": int(both_fail.sum()),
            "all_three": int((both_fail & cep_defined & ~ok_c).sum()),
        },
        "both_failure_modes": modes,
        "disagreements": disagreements,
        "by_region": by_region,
        "per_pitch": per_pitch,
    }


def _mag_spectrogram(
    batch: np.ndarray, nfft: int = 2048, hop: int = 512
) -> np.ndarray:
    """[..., T] waveforms -> [..., frames, nfft//2+1] linear magnitudes."""
    batch = np.asarray(batch, np.float64)
    frames = []
    window = np.hanning(nfft)
    for start in range(0, batch.shape[-1] - nfft + 1, hop):
        seg = batch[..., start : start + nfft] * window
        frames.append(np.abs(np.fft.rfft(seg, axis=-1)))
    return np.stack(frames, axis=-2)


def _logmag_spectrogram(
    batch: np.ndarray, nfft: int = 2048, hop: int = 512
) -> np.ndarray:
    """[..., T] waveforms -> [..., frames, nfft//2+1] log magnitudes."""
    return np.log(_mag_spectrogram(batch, nfft, hop) + 1e-6)


def log_spectral_distance(
    real: np.ndarray,
    fake: np.ndarray,
    *,
    nfft: int = 2048,
    hop: int = 512,
    floor_db: Optional[float] = None,
) -> float:
    """Mean L2 log-magnitude-spectrogram distance between two batches.

    ``floor_db`` (e.g. -60) clips both spectrograms at that level below
    the pair's common peak before the log. Without it, LSD between a
    synthetic note with an EXACT-zero background and any audio with a low
    noise floor is dominated by log-ratio of near-silence — inaudible
    bins can contribute the bulk of the distance (the round-2 "LSD
    plateau at ~6.15" — see DESIGN.md §4c). The floored variant measures
    distance over the audible structure.
    """
    ma = _mag_spectrogram(real, nfft, hop)
    mb = _mag_spectrogram(fake, nfft, hop)
    if floor_db is not None:
        floor = 10.0 ** (floor_db / 20.0) * max(ma.max(), mb.max())
        ma, mb = np.maximum(ma, floor), np.maximum(mb, floor)
    a, b = np.log(ma + 1e-6), np.log(mb + 1e-6)
    return float(np.mean(np.sqrt(np.mean((a - b) ** 2, axis=-1))))


def intra_pitch_diversity(
    waves: np.ndarray,
    pitches: Sequence[int],
    *,
    nfft: int = 2048,
    hop: int = 512,
    floor_db: Optional[float] = None,
) -> float:
    """Mean pairwise log-spectral distance among SAME-pitch notes.

    The mode-collapse detector the pitch metrics cannot be (VERDICT r2
    missing-item 1): a generator that emits one timbre per pitch scores
    perfectly on pitch accuracy yet ~0 here. Interpret it RELATIVE to the
    same statistic on a healthy reference set (see
    :func:`evaluate_sampler`'s ``diversity_ratio``) — absolute LSD units
    depend on the frontend. Pitches with fewer than 2 samples are
    skipped; NaN if nothing is comparable.
    """
    waves = np.asarray(waves)
    mags = _mag_spectrogram(waves, nfft, hop)
    if floor_db is not None:
        mags = np.maximum(mags, 10.0 ** (floor_db / 20.0) * mags.max())
    specs = np.log(mags + 1e-6)
    groups: Dict[int, list] = {}
    for i, p in enumerate(pitches):
        groups.setdefault(int(p), []).append(i)
    dists = []
    for idxs in groups.values():
        for a in range(len(idxs)):
            for b in range(a + 1, len(idxs)):
                d = specs[idxs[a]] - specs[idxs[b]]
                dists.append(np.mean(np.sqrt(np.mean(d**2, axis=-1))))
    return float(np.mean(dists)) if dists else float("nan")


def melspec_features(
    waves: np.ndarray,
    sample_rate: int = 16000,
    *,
    nfft: int = 2048,
    hop: int = 512,
    num_bands: int = 64,
    floor_db: Optional[float] = None,
) -> np.ndarray:
    """Per-note embedding for distribution metrics: [B, 2 * num_bands].

    Log-mel spectrogram (the same triangular HTK filterbank as the
    model's frontend, pooled to ``num_bands`` bands), summarized as the
    per-band time-mean and time-std — timbre (spectral envelope) and its
    temporal variability. Model-free and deterministic, so the Fréchet
    distance over it is comparable across checkpoints and runs (the role
    FAD's VGGish embedding plays upstream, without a pretrained-network
    dependency this machine cannot ship).

    ``floor_db`` clips the mel magnitudes at that level below the SET's
    peak before the log — without it the embedding means carry each
    set's silence floor, and the Fréchet distance between a zero-
    background fixture set and generated audio is dominated by that
    inaudible offset (same mechanism as LSD's floor, DESIGN.md §4c).
    """
    from gansynth_tpu.ops.mel import linear_to_mel_matrix

    spec = _mag_spectrogram(np.asarray(waves), nfft, hop)
    mel = linear_to_mel_matrix(
        num_mel_bins=num_bands,
        num_spectrogram_bins=nfft // 2 + 1,
        sample_rate=sample_rate,
        dtype=np.float64,
    )
    melmag = spec @ mel  # [B, frames, num_bands]
    if floor_db is not None:
        melmag = np.maximum(
            melmag, 10.0 ** (floor_db / 20.0) * melmag.max()
        )
    logmel = np.log(melmag + 1e-6)
    return np.concatenate(
        [logmel.mean(axis=1), logmel.std(axis=1)], axis=-1
    ).astype(np.float64)


def frechet_distance(
    feats_a: np.ndarray, feats_b: np.ndarray, *, eps: float = 1e-6
) -> float:
    """Fréchet (2-Wasserstein-between-Gaussians) distance between two
    feature sets: ``|mu_a - mu_b|^2 + tr(Ca + Cb - 2 sqrt(Ca Cb))``.

    The FID/FAD formula; ``tr sqrt(Ca Cb)`` is computed from the
    eigenvalues of ``Ca @ Cb`` (real and non-negative for PSD inputs up
    to round-off, which the clip absorbs). ``eps`` regularizes
    rank-deficient covariances (n_samples < dim).
    """
    a = np.asarray(feats_a, np.float64)
    b = np.asarray(feats_b, np.float64)
    if a.ndim != 2 or b.ndim != 2 or a.shape[1] != b.shape[1]:
        raise ValueError(f"need [N, D] feature sets, got {a.shape}, {b.shape}")
    mu_a, mu_b = a.mean(axis=0), b.mean(axis=0)
    d = a.shape[1]
    ca = np.cov(a, rowvar=False) + eps * np.eye(d)
    cb = np.cov(b, rowvar=False) + eps * np.eye(d)
    ev = np.linalg.eigvals(ca @ cb)
    tr_sqrt = float(np.sqrt(np.clip(ev.real, 0.0, None)).sum())
    return float(
        np.sum((mu_a - mu_b) ** 2) + np.trace(ca) + np.trace(cb)
        - 2.0 * tr_sqrt
    )


def evaluate_sampler(
    sampler,
    *,
    pitches: Sequence[int],
    samples_per_pitch: int = 4,
    sample_rate: int = 16000,
    seed: int = 0,
    reference_fn=None,
    attribution: bool = False,
) -> Dict[str, float]:
    """Sample the generator across ``pitches`` and score pitch fidelity.

    ``reference_fn(pitch, index) -> waveform`` supplies held-out real (or
    fixture) audio per conditioned pitch; when given, three
    distributional readouts join the pitch metrics:

    - ``log_spectral_distance``: mean LSD against the pitch-matched
      references (coarse per-note fidelity);
    - ``intra_pitch_diversity`` / ``..._ref`` / ``diversity_ratio``:
      mean pairwise same-pitch LSD of the generated set vs the reference
      set's own — ratio ~0 flags mode collapse, ~1 matches the
      reference's within-pitch variability (needs samples_per_pitch>=2);
    - ``frechet_mel``: Fréchet distance between generated and reference
      sets over :func:`melspec_features` embeddings (the FAD-analog
      whole-distribution readout).
    """
    import jax

    all_waves, all_pitches = [], []
    key = jax.random.key(seed)
    for i in range(samples_per_pitch):
        key, sub = jax.random.split(key)
        waves, _ = sampler(sub, list(pitches))
        all_waves.append(np.asarray(waves))
        all_pitches.extend(pitches)
    waves = np.concatenate(all_waves, axis=0)
    metrics = pitch_accuracy(waves, all_pitches, sample_rate)
    metrics["rms"] = float(np.sqrt(np.mean(waves**2)))
    metrics["num_samples"] = float(waves.shape[0])
    if attribution:
        metrics["attribution"] = pitch_attribution(
            waves, all_pitches, sample_rate
        )
    if samples_per_pitch >= 2:
        metrics["intra_pitch_diversity"] = intra_pitch_diversity(
            waves, all_pitches
        )
        metrics["intra_pitch_diversity_60db"] = intra_pitch_diversity(
            waves, all_pitches, floor_db=-60.0
        )
    if reference_fn is not None:
        refs = np.stack(
            [reference_fn(int(p), i) for i, p in enumerate(all_pitches)]
        )
        metrics["log_spectral_distance"] = log_spectral_distance(refs, waves)
        # The -60 dB-floored variant measures distance over AUDIBLE
        # structure; the gap between the two quantifies how much of the
        # raw LSD is silence-floor log-ratio (DESIGN.md §4c).
        metrics["log_spectral_distance_60db"] = log_spectral_distance(
            refs, waves, floor_db=-60.0
        )
        metrics["frechet_mel"] = frechet_distance(
            melspec_features(waves, sample_rate),
            melspec_features(refs, sample_rate),
        )
        # -60 dB-floored embeddings: distance over audible structure
        # (the raw variant is dominated by the silence-floor offset
        # between exact-zero-background fixtures and generated audio).
        gen_feats_f = melspec_features(waves, sample_rate, floor_db=-60.0)
        ref_feats_f = melspec_features(refs, sample_rate, floor_db=-60.0)
        metrics["frechet_mel_60db"] = frechet_distance(
            gen_feats_f, ref_feats_f
        )
        if len(refs) >= 4:
            # Noise floor of the Fréchet readout: distance between two
            # disjoint halves of the reference set itself (what "same
            # distribution" scores at this sample count).
            ref_feats = melspec_features(refs, sample_rate)
            metrics["frechet_mel_ref_floor"] = frechet_distance(
                ref_feats[0::2], ref_feats[1::2]
            )
            metrics["frechet_mel_60db_ref_floor"] = frechet_distance(
                ref_feats_f[0::2], ref_feats_f[1::2]
            )
        if samples_per_pitch >= 2:
            for suffix, floor in (("", None), ("_60db", -60.0)):
                ref_div = intra_pitch_diversity(
                    refs, all_pitches, floor_db=floor
                )
                metrics[f"intra_pitch_diversity_ref{suffix}"] = ref_div
                if ref_div and np.isfinite(ref_div):
                    metrics[f"diversity_ratio{suffix}"] = (
                        metrics[f"intra_pitch_diversity{suffix}"] / ref_div
                    )
    return metrics


def fixture_reference_fn(length: int = 64000, sample_rate: int = 16000):
    """Default LSD reference: deterministic fixture notes per pitch."""
    from gansynth_tpu.data.fixtures import synthesize_note

    def ref(pitch: int, index: int) -> np.ndarray:
        return synthesize_note(
            pitch, sample_rate=sample_rate, length=length, seed=index
        )

    return ref


def tfrecord_reference_fn(files, config, *, max_per_pitch: int = 8):
    """LSD reference from real NSynth TFRecords: indexes examples by pitch
    (up to ``max_per_pitch`` each) and serves them round-robin."""
    from gansynth_tpu.data.nsynth import make_nsynth_iterator

    by_pitch: Dict[int, list] = {}
    # batch_size=1: no drop_remainder losses on small reference sets.
    it = make_nsynth_iterator(
        files, config, batch_size=1, shuffle=False, repeat=False,
        acoustic_only=False,
    )
    for waves, pitches in it:
        for w, p in zip(waves, pitches):
            bucket = by_pitch.setdefault(int(p), [])
            if len(bucket) < max_per_pitch:
                bucket.append(np.asarray(w, np.float32))

    def ref(pitch: int, index: int) -> np.ndarray:
        bucket = by_pitch.get(int(pitch))
        if not bucket:
            raise KeyError(f"no reference examples at pitch {pitch}")
        return bucket[index % len(bucket)]

    return ref
