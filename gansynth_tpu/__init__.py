"""gansynth_tpu — a TPU-native GANSynth framework built from scratch in JAX.

Re-implements the capabilities of the reference (skmhrk1209/GANSynth — a
TF-1.x progressive-GAN audio synthesizer over NSynth mel-IF spectrograms;
see SURVEY.md for the full component inventory) as an idiomatic
JAX/XLA/Pallas framework:

- ``ops``      — the spectral frontend/synthesis library (STFT, log-mel
                 magnitude, phase unwrapping, instantaneous frequency,
                 mel pseudo-inverse, phase accumulation, inverse STFT).
                 Pure jittable functions; SURVEY.md §2.2 (S1–S11).
- ``models``   — progressive GAN generator/discriminator with equalized-LR
                 convs, pixel norm, minibatch stddev, stage fade-in.
                 SURVEY.md §2.3–2.4 (N1–N6, G1–G3, DS1–DS2).
- ``train``    — WGAN-GP (+ drift + auxiliary pitch classification) losses,
                 Adam optimizers, EMA generator, progressive stage schedule,
                 the jitted training step and the outer loop.
                 SURVEY.md §2.5 (T1–T6).
- ``parallel`` — mesh construction and sharding specs for data-parallel
                 training over a TPU slice. SURVEY.md §2.7–2.8.
- ``data``     — NSynth TFRecord ingest (host side) and synthetic fixtures.
                 SURVEY.md §2.1 (D1–D3).
- ``synth``    — the fully-jitted latent+pitch → waveform sampler.
                 SURVEY.md §3.2.
- ``utils``    — config dataclasses, checkpointing (orbax), small helpers.
"""

__version__ = "0.1.0"

from gansynth_tpu.utils.config import (  # noqa: F401
    AudioConfig,
    ModelConfig,
    TrainConfig,
    Config,
)
