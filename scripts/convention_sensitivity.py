"""Bound the sensitivity of the two [K-low] spectral conventions
(VERDICT r1 weak-item 3): ``pad_left_fraction`` and ``logmel_min/max``.

Neither constant can be verified against the reference (empty mount,
SURVEY.md §0), so this probe measures what actually depends on them:

1. roundtrip fidelity — wave -> mel-IF image -> wave SNR on fixture notes
   spanning the pitch range, plus white noise, per convention variant;
2. GAN-image health — the fraction of log-mel channel values that fall
   outside [-1, 1] (the generator's tanh range: anything outside is
   unreachable by the model and distorts training targets), and the
   occupied dynamic range.

Output: one markdown table per axis on stdout (paste into DESIGN.md).
Run on CPU or TPU; nothing here is timing-sensitive. Do not run
concurrently with a TPU job (single-tenant tunnel).
"""

import dataclasses
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from gansynth_tpu.data.fixtures import synthesize_note  # noqa: E402
from gansynth_tpu.ops.spectral import (  # noqa: E402
    image_to_wave,
    wave_to_image,
)
from gansynth_tpu.utils.config import AudioConfig  # noqa: E402


def batch() -> np.ndarray:
    rng = np.random.default_rng(0)
    waves = [synthesize_note(p, seed=p) for p in (24, 40, 60, 72, 84)]
    waves.append(0.1 * rng.standard_normal(64000).astype(np.float32))
    return np.stack(waves)


def snr_db(ref: np.ndarray, rec: np.ndarray) -> float:
    err = ref - rec
    return float(
        10 * np.log10(np.sum(ref**2) / max(np.sum(err**2), 1e-30))
    )


def measure(cfg: AudioConfig, waves: np.ndarray) -> dict:
    img = wave_to_image(jnp.asarray(waves), cfg)
    rec = np.asarray(image_to_wave(img, cfg))
    img = np.asarray(img)
    logmel = img[..., 0]
    return {
        "snr_notes": np.mean(
            [snr_db(waves[i], rec[i]) for i in range(len(waves) - 1)]
        ),
        "snr_noise": snr_db(waves[-1], rec[-1]),
        "clipped_pct": 100.0 * np.mean(np.abs(logmel) > 1.0),
        "p01": float(np.percentile(logmel, 1)),
        "p99": float(np.percentile(logmel, 99)),
    }


def table(title: str, rows: list) -> None:
    print(f"\n### {title}\n")
    print("| variant | note SNR dB | noise SNR dB | outside tanh % "
          "| logmel p1 | p99 |")
    print("|---|---|---|---|---|---|")
    for name, m in rows:
        print(
            f"| {name} | {m['snr_notes']:.2f} | {m['snr_noise']:.2f} "
            f"| {m['clipped_pct']:.3f} | {m['p01']:.3f} | {m['p99']:.3f} |"
        )


def main() -> None:
    waves = batch()
    base = AudioConfig()

    rows = []
    for frac in (0.0, 0.25, 0.5, 0.75, 1.0):
        cfg = dataclasses.replace(base, pad_left_fraction=frac)
        rows.append((f"pad_left_fraction={frac}", measure(cfg, waves)))
    table("pad_left_fraction sensitivity (logmel range fixed at ±14)", rows)

    rows = []
    for half_range in (10.0, 12.0, 14.0, 16.0, 18.0):
        cfg = dataclasses.replace(
            base, logmel_min=-half_range, logmel_max=half_range
        )
        rows.append((f"logmel range ±{half_range}", measure(cfg, waves)))
    table("logmel_min/max sensitivity (pad split fixed at 0.5)", rows)


if __name__ == "__main__":
    main()
