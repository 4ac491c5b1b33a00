"""Configuration dataclasses for the whole framework.

Every reference-derived hyperparameter lives HERE and nowhere else, per
SURVEY.md §7 "hard parts" item 5: the reference mount was empty at survey
time, so values tagged [K-med]/[K-low] in SURVEY.md are encoded as config
defaults (re-verifiable constants), while tests assert only [E]-grade facts
(shapes, pipeline stages, feature list).

Provenance tags in comments refer to SURVEY.md §0's scheme.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Spectral frontend / synthesis parameters (SURVEY.md §2.2, S1–S11)."""

    sample_rate: int = 16000        # [E] NSynth 4s @ 16kHz
    audio_length: int = 64000       # [E] 4 s of 16 kHz audio
    frame_length: int = 2048        # [K-high] STFT window
    frame_step: int = 512           # [K-high] 75% overlap
    num_time_frames: int = 128      # [E] spectrogram image height
    num_freq_bins: int = 1024       # [E] spectrogram image width (DC dropped)
    num_mel_bins: int = 1024        # [K-high] high-frequency-resolution variant
    mel_lower_hertz: float = 0.0    # [K-med]
    mel_upper_hertz: float = 8000.0  # [K-med] Nyquist
    mel_break_hertz: float = 700.0   # HTK mel scale constants
    mel_break_mels: float = 1127.0
    # log(mag^2 @ mel + eps) dynamic range mapped linearly onto [-1, 1]
    # for GAN training (reference uses a fixed utils.scale map, [K-med]).
    # log(1e-6) ~= -13.8 is the floor of the log-mel-magnitude-squared.
    # log(1e-6) ~= -13.8 is the floor; the ceiling for full-scale audio is
    # ~2*log(window_gain) ~= 2*log(1024) ~= 13.9 (Hann sum at 2048 taps),
    # so [-14, 14] covers the full dynamic range symmetrically.
    logmel_eps: float = 1e-6
    logmel_min: float = -14.0       # config default — [K-low], re-verify
    logmel_max: float = 14.0        # config default — [K-low], re-verify
    # How the 3072 padding samples (67072 - 64000) are split between the
    # two ends of the waveform before framing. SURVEY.md §7 hard-part 1
    # flags this convention as unverifiable while the mount is empty;
    # symmetric split minimizes edge reconstruction error.
    pad_left_fraction: float = 0.5
    discard_dc: bool = True         # [K-high] 1025 rFFT bins -> 1024 (DC dropped)
    # DFT lowerings: "fft" uses the XLA FFT HLO; "matmul" computes the
    # (i)DFT as real MXU matmuls with the analysis/synthesis window folded
    # into the DFT matrices (TPUs are matmul machines; their FFT lowering
    # is comparatively weak). Same function to float tolerance — see
    # tests/test_spectral.py. Synthesis defaults to matmul (measured
    # faster); analysis keeps the FFT default (not a measured bottleneck,
    # avoids 17 MB of baked constants in every training step).
    idft_mode: str = "matmul"
    dft_mode: str = "fft"
    # Pre-iDFT synthesis chain: "xla" (reference lowering), "pallas"
    # (kernels/pallas_synthesis.py — one fused VMEM-resident kernel per
    # batch element; equality-tested against the XLA path), or "auto"
    # (pallas on accelerator backends, xla on CPU where compiled Pallas
    # is unavailable). Default "auto" per the round-4 bench matrix:
    # the Pallas kernel wins the flagship synthesis path on the real
    # chip, 7887x vs 7532x real-time (BENCH_r04, +4.7%).
    synthesis_kernel: str = "auto"

    @property
    def padded_length(self) -> int:
        """Samples after padding: (frames-1)*hop + frame_length (= 67072)."""
        return (self.num_time_frames - 1) * self.frame_step + self.frame_length

    @property
    def pad_left(self) -> int:
        pad = self.padded_length - self.audio_length
        return int(pad * self.pad_left_fraction)

    @property
    def pad_right(self) -> int:
        return self.padded_length - self.audio_length - self.pad_left

    @property
    def num_rfft_bins(self) -> int:
        return self.frame_length // 2 + 1  # 1025

    @property
    def overlap_factor(self) -> int:
        return self.frame_length // self.frame_step  # 4


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Progressive GAN architecture (SURVEY.md §2.3–2.4)."""

    latent_dim: int = 256           # [K-high]
    num_pitches: int = 61           # [K-high] MIDI 24..84 inclusive -> 61 classes
    pitch_min: int = 24
    pitch_max: int = 84
    # Stage ladder: (2,16) -> (4,32) -> ... -> (128,1024); 7 resolutions.
    base_height: int = 2            # [K-high] base grid 2x16 (1:8 aspect)
    base_width: int = 16
    num_stages: int = 7             # [E] 6 doublings to 128x1024
    num_channels: int = 2           # [E] (scaled log-mel-mag, mel-IF)
    # Channel widths: min(fmap_base >> stage, fmap_max)  [K-med]
    fmap_base: int = 4096
    fmap_max: int = 256
    fmap_min: int = 32
    leaky_relu_slope: float = 0.2   # [K-med]
    pixelnorm_eps: float = 1e-8
    mbstd_eps: float = 1e-8
    mbstd_group_size: int = 4       # stddev computed over groups of this size
    # Minibatch-stddev batch semantics under data parallelism (SURVEY.md
    # §2.7 decision point). 1 = GLOBAL-batch stats (default: DP step is
    # numerically identical to a single-device step on the same global
    # batch). >1 = PER-REPLICA stats over that many contiguous batch
    # chunks (the reference-faithful option — a single-device reference
    # only ever sees its local batch; also shard-local, no collective).
    # The CLI's --mbstd per-replica sets this to the device count.
    mbstd_replicas: int = 1
    generator_output: str = "tanh"  # [K-med] bounded output for the GAN image
    # MXU compute dtype for convs/denses: "float32" (parity default) or
    # "bfloat16" (TPU fast path — params, accumulation, normalization and
    # the whole spectral chain stay float32 regardless).
    compute_dtype: str = "float32"
    # Lowering of the 3x3 trunk convs: "xla" (conv HLO) or "pallas"
    # (kernels/pallas_conv.py VMEM row-band kernel — only shapes passing
    # conv3x3_eligible; the rest stay on the conv HLO). Equality-tested.
    # "xla" is the measured-faster default (DESIGN.md §2c).
    conv_kernel: str = "xla"
    # Lowering of the full-resolution DISCRIMINATOR block (conv->lrelu->
    # conv->lrelu->avgpool): "xla" (three fused XLA kernels) or "pallas"
    # (kernels/pallas_dblock.py — the whole chain in one VMEM-resident
    # program; only the stage-6 geometry passing dblock_eligible, other
    # stages stay on XLA). Checkpoint-interchangeable params;
    # equality-tested incl. second-order gradients.
    dblock_kernel: str = "xla"
    # Rematerialize trunk blocks in the backward pass (jax.checkpoint).
    # The WGAN-GP step holds 3 critic passes plus second-order gradients
    # live at once (SURVEY.md §7 hard-part 3); remat trades ~1/3 more
    # compute for activation memory, unlocking larger full-res batches.
    remat: bool = False

    def stage_resolution(self, stage: int) -> Tuple[int, int]:
        """(height, width) of the spectrogram image at ``stage`` (0-based)."""
        return (self.base_height << stage, self.base_width << stage)

    def stage_channels(self, stage: int) -> int:
        """Feature-map width of the trunk block at ``stage``."""
        return max(min(self.fmap_base >> stage, self.fmap_max), self.fmap_min)

    @property
    def final_resolution(self) -> Tuple[int, int]:
        return self.stage_resolution(self.num_stages - 1)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Losses, optimizers, progressive schedule (SURVEY.md §2.5)."""

    batch_size: int = 8             # global batch
    # Per-stage global batch override (SURVEY.md §3.4: "batch size may
    # shrink at high resolution" [K-med]; §7 hard-part 3). Entry s applies
    # while training stage s; None = uniform batch_size. Low stages run
    # far below chip capacity at batch 8, so large early batches shorten
    # the ladder at identical math per step.
    stage_batch_sizes: Optional[Tuple[int, ...]] = None
    learning_rate: float = 8e-4     # [K-med] paper/magenta default
    adam_beta1: float = 0.0         # [K-med]
    adam_beta2: float = 0.99        # [K-med]
    adam_eps: float = 1e-8
    gp_weight: float = 10.0         # [K-high] WGAN-GP lambda
    drift_weight: float = 1e-3      # [K-med] PGGAN epsilon-drift
    aux_pitch_weight: float = 10.0  # [K-med] AC-GAN pitch CE weight
    # SURVEY.md DS2: the AC-GAN head trains on "real and fake" examples.
    # True (parity default) adds the fake-batch pitch CE to D's objective;
    # False restores the real-only variant (documented in PARITY.md).
    d_pitch_ce_on_fake: bool = True
    ema_decay: float = 0.999        # [K-med]
    # Generator-side pitch-consistency loss (ops/harmonic.py): CE of a
    # FIXED harmonic-template classifier over the generated image against
    # the conditioned pitch. 0 (default) = off, strict reference parity.
    # Nonzero closes the AC-GAN "classifier cheating" channel by
    # construction (DESIGN.md §4d: D's trainable head can be watermarked;
    # a parameter-free physics classifier cannot).
    pitch_consistency_weight: float = 0.0
    # Temperature on the template cosine scores (logit = tau * cosine).
    pitch_consistency_tau: float = 40.0
    # One-run "anchor -> release" schedule (DESIGN.md §4g production
    # recipe, measured: 8x Fréchet recovery at zero pitch cost). From
    # this GLOBAL step on, the training program is rebuilt as
    # ``Config.released()``: pitch_consistency_weight = 0 (the anchor is
    # scaffolding — removable once pitch structure has locked in) AND
    # d_pitch_ce_on_fake = False (the AC-GAN watermark channel stays
    # closed the repair-proven way, DESIGN.md §4d, so no label swap can
    # form in the anchor's absence). None = never release. Purely a
    # function of the global step, so resume lands in the right phase
    # with no extra persisted state.
    pitch_consistency_release_step: Optional[int] = None
    # First ladder stage the consistency loss applies to. The stage-s
    # image is the full-res image average-pooled 2^(6-s)x IN LOG SPACE,
    # which geometric-means narrow harmonic peaks into the floor; the
    # fixed classifier reads fixture notes at 100%/90% exact at stages
    # 6/5 but degrades to ~55% at stage 4 (measured), so below this
    # stage its CE would anchor to noise.
    pitch_consistency_min_stage: int = 5
    # How the discriminator update evaluates its critic passes (a pure
    # scheduling choice — same math to float tolerance, tested):
    #   "none": three separate d.apply calls (real / fake / GP interp).
    #   "pair": real+fake stacked and vmapped through ONE call — convs see
    #           a 2B batch (better MXU lane fill at the wide stages);
    #           minibatch-stddev stats stay per-sub-batch under vmap.
    #   "all":  real+fake+interp stacked (3B convs); the gradient penalty
    #           differentiates through the stacked program (pays a 3B
    #           backward-to-input instead of B).
    fused_critic: str = "none"
    # Progressive schedule: each stage > 0 fades in over `fade_steps`, then
    # stabilizes for `stable_steps`. Stage 0 has no fade. The per-stage
    # tuples override the scalars stage-by-stage when set (compressed
    # schedules spend more steps at the cheap low resolutions).
    fade_steps: int = 800_000
    stable_steps: int = 800_000
    stage_fade_steps: Optional[Tuple[int, ...]] = None
    stage_stable_steps: Optional[Tuple[int, ...]] = None
    # Steps fused into ONE device program (a lax.scan over the train
    # step). Amortizes per-dispatch host overhead — on real pods this is
    # the difference between host-paced and device-paced training; through
    # this machine's tunneled backend it is essential. 1 = classic loop.
    unroll: int = 1
    # Sampling law of the HBM-resident (--device-cache) data stream. Both
    # are stateless in (rng, step) — resume replays identical batches:
    #   "shuffle":     per-epoch on-device permutation (every example seen
    #                  exactly once per epoch — the reference family's
    #                  shuffle-epoch semantics).
    #   "replacement": uniform i.i.d. draws (the round-2 behavior; ~37% of
    #                  a 2048-note set unseen in any 2048-draw window).
    cached_stream: str = "shuffle"
    # HBM placement of the --device-cache dataset under a mesh:
    #   "replicate": full copy per device — the batch gather is
    #                communication-free (each device slices its rows from
    #                its local copy). Right for fixture-sized sets.
    #   "shard":     example axis split across devices — per-device HBM
    #                holds N/n examples, so the cacheable dataset scales
    #                with the slice; the batch gather costs one
    #                O(B*T) all-reduce per step (GSPMD's masked gather),
    #                trivial over ICI next to the step's compute.
    # Single-device runs ignore this.
    device_cache_layout: str = "replicate"
    seed: int = 0
    checkpoint_every: int = 2000
    log_every: int = 100
    # Periodic EMA-generator audio artifact dumps (SURVEY.md §5 metrics
    # row: "periodic audio/spectrogram artifact dumps from the EMA
    # sampler"). 0 disables.
    sample_every: int = 0
    sample_pitches: Tuple[int, ...] = (36, 60, 84)

    def batch_for_stage(self, stage: int) -> int:
        """Global batch while training ``stage`` (per-stage override or
        the uniform ``batch_size``)."""
        if self.stage_batch_sizes is None:
            return self.batch_size
        return int(self.stage_batch_sizes[stage])


@dataclasses.dataclass(frozen=True)
class Config:
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def with_overrides(self, overrides: dict) -> "Config":
        """Apply a nested override dict, e.g. from a ``--config`` JSON file:
        ``{"audio": {...}, "model": {...}, "train": {...}}``. Unknown keys
        raise (typo protection)."""
        sections = {}
        for section, values in overrides.items():
            if section not in ("audio", "model", "train"):
                raise ValueError(f"unknown config section {section!r}")
            current = getattr(self, section)
            field_names = {f.name for f in dataclasses.fields(current)}
            unknown = set(values) - field_names
            if unknown:
                raise ValueError(
                    f"unknown {section} config keys: {sorted(unknown)}"
                )
            # JSON has no tuples; every sequence-valued config field is a
            # tuple (sample_pitches, stage_fade_steps, ...), so lists map
            # to tuples across the board.
            values = {
                k: tuple(v) if isinstance(v, list) else v
                for k, v in values.items()
            }
            sections[section] = dataclasses.replace(current, **values)
        return dataclasses.replace(self, **sections)

    def released(self) -> "Config":
        """The post-release variant of this config (DESIGN.md §4g): the
        harmonic anchor off, fake-batch pitch CE off. The training loop
        switches to this variant at
        ``train.pitch_consistency_release_step``."""
        return self.with_overrides(
            {"train": {"pitch_consistency_weight": 0.0,
                       "d_pitch_ce_on_fake": False}}
        )


def scale(x, in_min, in_max, out_min, out_max):
    """Linear range map (the reference's ``utils.scale``, SURVEY.md §1 util row).

    Maps ``in_min -> out_min`` and ``in_max -> out_max`` linearly; does NOT
    clip, so it is exactly invertible by swapping the ranges.
    """
    return out_min + (x - in_min) * (out_max - out_min) / (in_max - in_min)
