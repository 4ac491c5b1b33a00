"""Command-line entry point (SURVEY.md §2.6, C1–C3).

Subcommands mirror the reference's modes plus the framework's own tooling:

- ``train``     — progressive WGAN-GP training from NSynth TFRecords (or
                  synthetic fixtures with ``--synthetic``), checkpointed
                  and resumable.
- ``generate``  — restore the EMA generator and write pitch-conditioned
                  ``.wav`` samples (C3).
- ``evaluate``  — pitch-fidelity metrics from a checkpoint (JSON out).
- ``serve``     — HTTP synthesis service (POST pitches -> WAV).
- ``roundtrip`` — wave -> mel-IF image -> wave fidelity check on a WAV
                  file or a synthetic tone (driver config 1).
- ``fixtures``  — write synthetic NSynth-like TFRecords.

Run as ``python -m gansynth_tpu.cli <subcommand> ...``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from gansynth_tpu.utils.config import AudioConfig, Config, ModelConfig, TrainConfig


def _parse_stage_steps(text):
    """Comma-separated per-stage step counts -> tuple (None when unset)."""
    if not text:
        return None
    return tuple(int(s) for s in text.split(","))


def _build_config(args) -> Config:
    train = TrainConfig(
        batch_size=args.batch_size,
        stage_batch_sizes=_parse_stage_steps(
            getattr(args, "stage_batch_sizes", None)
        ),
        learning_rate=args.learning_rate,
        fade_steps=args.fade_steps,
        stable_steps=args.stable_steps,
        stage_fade_steps=_parse_stage_steps(
            getattr(args, "stage_fade_steps", None)
        ),
        stage_stable_steps=_parse_stage_steps(
            getattr(args, "stage_stable_steps", None)
        ),
        unroll=getattr(args, "unroll", 1),
        device_cache_layout=getattr(
            args, "device_cache_layout", "replicate"
        ),
        fused_critic=getattr(args, "fused_critic", "none"),
        pitch_consistency_weight=getattr(args, "pitch_consistency", 0.0),
        pitch_consistency_release_step=getattr(
            args, "pitch_consistency_release", None
        ),
        seed=args.seed,
        checkpoint_every=args.checkpoint_every,
        log_every=args.log_every,
        sample_every=getattr(args, "sample_every", 0),
    )
    mbstd_replicas = 1
    if getattr(args, "mbstd", "global") == "per-replica":
        import jax

        mbstd_replicas = len(jax.devices())
    model = ModelConfig(
        latent_dim=args.latent_dim,
        fmap_base=args.fmap_base,
        fmap_max=args.fmap_max,
        compute_dtype=args.compute_dtype,
        mbstd_replicas=mbstd_replicas,
    )
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    config = Config(model=model, train=train)
    if getattr(args, "config", None):
        import json

        with open(args.config) as f:
            config = config.with_overrides(json.load(f))
    if getattr(args, "dump_config", False):
        # Reproducibility: print the EFFECTIVE config (flags + --config
        # overrides, every default resolved) as JSON that can be fed back
        # through --config, then exit without touching any device.
        import dataclasses as _dc
        import json

        print(json.dumps(_dc.asdict(config), indent=2, sort_keys=True))
        raise SystemExit(0)
    return config


def _add_common_train_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", help="JSON file with nested "
                   '{"audio": {...}, "model": {...}, "train": {...}} '
                   "overrides, applied on top of the flags")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--stage-batch-sizes", default=None,
                   help="comma-separated per-stage GLOBAL batch sizes "
                   "(one per stage; overrides --batch-size — large "
                   "batches at the cheap low resolutions shorten the "
                   "ladder, SURVEY.md §3.4)")
    p.add_argument("--learning-rate", type=float, default=8e-4)
    p.add_argument("--latent-dim", type=int, default=256)
    p.add_argument("--fmap-base", type=int, default=4096)
    p.add_argument("--fmap-max", type=int, default=256)
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="MXU compute dtype (params stay float32)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (the race-detector analog "
                   "for this functional framework)")
    p.add_argument("--fade-steps", type=int, default=800_000)
    p.add_argument("--stable-steps", type=int, default=800_000)
    p.add_argument("--stage-fade-steps", default=None,
                   help="comma-separated per-stage fade steps (one per "
                   "stage; overrides --fade-steps)")
    p.add_argument("--stage-stable-steps", default=None,
                   help="comma-separated per-stage stabilization steps")
    p.add_argument("--unroll", type=int, default=1,
                   help="train steps fused into one device program "
                   "(lax.scan) — amortizes host dispatch")
    p.add_argument("--fused-critic", default="none",
                   choices=["none", "pair", "all"],
                   help="batch the discriminator's critic passes into one "
                   "vmapped call (pair: real+fake; all: +GP interpolates) "
                   "— same math, fatter conv batches")
    p.add_argument("--pitch-consistency", type=float, default=0.0,
                   help="weight of the generator-side harmonic-template "
                   "pitch CE (ops/harmonic.py) — a parameter-free "
                   "classifier the generator cannot watermark, closing "
                   "the AC-GAN label-swap channel; 0 = off (reference "
                   "parity)")
    p.add_argument("--pitch-consistency-release", type=int, default=None,
                   metavar="STEP",
                   help="global step at which the anchor comes off in ONE "
                   "run (DESIGN.md §4g production recipe): from STEP on, "
                   "pitch-consistency weight drops to 0 and the AC-GAN "
                   "head stops training on fake batches — distribution "
                   "quality recovers, pitch lock-in persists")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint-every", type=int, default=2000)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--dump-config", action="store_true",
                   help="print the effective config as --config-compatible "
                   "JSON and exit")


def cmd_train(args) -> int:
    import dataclasses
    import json

    from gansynth_tpu.data import make_nsynth_iterator, write_synthetic_tfrecords
    from gansynth_tpu.train.loop import train

    config = _build_config(args)
    # Persist the effective config with the run: generate/evaluate/serve
    # derive the trained stage from the SCHEDULE, which lives in flags —
    # without this file a later `--stage auto` against different flags
    # would silently sample at the wrong stage.
    os.makedirs(args.model_dir, exist_ok=True)
    with open(os.path.join(args.model_dir, "train_config.json"), "w") as f:
        json.dump(dataclasses.asdict(config), f, indent=2, sort_keys=True)
    files = list(args.data or [])
    if args.synthetic and not files:
        # Per-run fixture file inside the model dir: a shared temp path
        # would be regenerated by concurrent runs mid-read (observed as
        # "truncated record body"), and keeping it with the run makes
        # resumes read the identical data.
        os.makedirs(args.model_dir, exist_ok=True)
        path = os.path.join(args.model_dir, "fixtures.tfrecord")
        if not os.path.exists(path):
            write_synthetic_tfrecords(
                path, num_examples=256, seed=config.train.seed
            )
        files = [path]
    if not files:
        print("error: pass --data <tfrecord...> or --synthetic", file=sys.stderr)
        return 2

    num_shards, shard_index = 1, 0
    batch_size = config.train.batch_size
    if args.multihost:
        # Pod-slice training: one process per host; each decodes its slice
        # of the data and the mesh spans every chip in the slice.
        import jax

        from gansynth_tpu.parallel import initialize_multihost

        initialize_multihost()
        num_shards, shard_index = jax.process_count(), jax.process_index()
        # TrainConfig.batch_size is the GLOBAL batch everywhere; each
        # process decodes only its slice of it.
        if batch_size % num_shards:
            print(
                f"error: global batch {batch_size} must divide the "
                f"process count {num_shards}",
                file=sys.stderr,
            )
            return 2
        batch_size //= num_shards

    if args.ingest == "native":
        from gansynth_tpu.data import make_native_iterator as make_iterator
    else:
        make_iterator = make_nsynth_iterator

    # Data-iterator resume: position the stream at the restored step
    # (position == batch count == step; skip runs in the decoder, and the
    # loop is told the iterator is already there).
    resume_step = 0
    ckpt_dir = os.path.join(args.model_dir, "checkpoints")
    if os.path.isdir(ckpt_dir):
        steps = [int(p) for p in os.listdir(ckpt_dir) if p.isdigit()]
        resume_step = max(steps, default=0)

    device_dataset = None
    data = None
    if getattr(args, "device_cache", False):
        # HBM-resident dataset: decode everything once, train with zero
        # host transfer per step. Under --data-parallel/--multihost the
        # cache is placed per --device-cache-layout and each gathered
        # batch is sharded over the mesh (train/loop.py); in a pod every
        # process decodes the identical full set (the fill below is
        # deliberately unsharded) and contributes its piece.
        waves, pitches = [], []
        for w, p in make_iterator(
            files, config, acoustic_only=not args.synthetic,
            families=args.instrument_families,
            batch_size=64, shuffle=False, repeat=False,
            drop_remainder=False,
        ):
            waves.append(np.asarray(w))
            pitches.append(np.asarray(p))
        device_dataset = (np.concatenate(waves), np.concatenate(pitches))
        print(f"device cache: {device_dataset[0].shape[0]} examples "
              f"({device_dataset[0].nbytes / 2**20:.0f} MiB) in HBM")
    elif config.train.stage_batch_sizes is not None:
        # Per-stage batch sizes: the loop asks for one stream per ladder
        # stage (fixed-batch iterators cannot change shape mid-stream).
        # Each stage gets an independent shuffle stream; skip_batches
        # positions it for exact resume.
        acoustic = not args.synthetic

        def data_factory(stage, global_batch, skip):
            if global_batch % num_shards:
                raise ValueError(
                    f"stage {stage} global batch {global_batch} must "
                    f"divide the process count {num_shards}"
                )
            return make_iterator(
                files, config, acoustic_only=acoustic,
                families=args.instrument_families,
                batch_size=global_batch // num_shards,
                seed=config.train.seed + 7919 * stage,
                num_shards=num_shards, shard_index=shard_index,
                skip_batches=skip,
            )
    else:
        data = make_iterator(
            files, config, acoustic_only=not args.synthetic,
            families=args.instrument_families,
            batch_size=batch_size, seed=config.train.seed,
            num_shards=num_shards, shard_index=shard_index,
            skip_batches=resume_step,
        )
    state = train(
        config,
        data,
        num_steps=args.num_steps,
        workdir=args.model_dir,
        use_mesh=args.data_parallel or args.multihost,
        device_dataset=device_dataset,
        data_position=resume_step,
        data_factory=(
            data_factory
            if config.train.stage_batch_sizes is not None
            and device_dataset is None
            else None
        ),
    )
    print(f"trained to step {int(state.step)}; checkpoints in "
          f"{args.model_dir}/checkpoints")
    return 0


# (flag name, parser default) for the model flags a restore template
# depends on — used to tell "explicitly overridden" from "left default".
_MODEL_FLAG_DEFAULTS = (
    ("latent_dim", 256),
    ("fmap_base", 4096),
    ("fmap_max", 256),
    ("compute_dtype", "float32"),
)


def _run_config(args, config) -> Config:
    """Config for RESTORING a trained run.

    The run's persisted ``train_config.json`` is the source of truth for
    the model/audio/schedule a checkpoint was trained with — a run trained
    with non-default flags restores WITHOUT repeating them. Explicit
    caller choices still win: any model flag that differs from its parser
    default, and the ``--config`` JSON, are re-applied on top.
    """
    import dataclasses
    import json

    saved = os.path.join(args.model_dir, "train_config.json")
    if not os.path.exists(saved):
        return config
    with open(saved) as f:
        run = Config().with_overrides(json.load(f))
    flag_overrides = {
        name: getattr(args, name)
        for name, default in _MODEL_FLAG_DEFAULTS
        if getattr(args, name, default) != default
    }
    if flag_overrides:
        run = dataclasses.replace(
            run, model=dataclasses.replace(run.model, **flag_overrides)
        )
    if getattr(args, "config", None):
        with open(args.config) as f:
            run = run.with_overrides(json.load(f))
    return run


def _restore_sampler(args, config):
    """Restore the EMA generator and build a sampler at the right stage.

    Returns ``(sampler, step, stage, run_config)`` — the run config comes
    from :func:`_run_config` (persisted train_config.json, flag overrides
    on top), so callers must use IT, not their flag-built config, for
    everything downstream (sample rate, pitch range, serving).

    A checkpoint taken mid-ladder has untrained blocks above its stage;
    sampling must run at the TRAINED stage (waveforms are synthesized from
    the nearest-upsampled full-resolution image below the final stage).
    ``--stage auto`` resolves the stage from, in order: the ``__stage__``
    recorded in ``ema.npz`` or the run's schedule — so evaluating a run
    does NOT require repeating its ``--stage-*-steps`` flags. ``--stage
    N`` overrides.
    """
    from gansynth_tpu.synth import Sampler
    from gansynth_tpu.train.schedule import schedule_from_config
    from gansynth_tpu.train.state import create_train_state
    from gansynth_tpu.utils.checkpoint import Checkpointer, load_ema_npz

    config = _run_config(args, config)
    template = create_train_state(config)
    npz = os.path.join(args.model_dir, "ema.npz")
    has_full = os.path.isdir(os.path.join(args.model_dir, "checkpoints"))
    npz_stage = None
    if os.path.exists(npz) and not has_full:
        # Archived runs keep only the compact EMA export (full orbax
        # checkpoints are ~7x larger and only needed to resume training).
        ema_params, step, npz_stage = load_ema_npz(npz, template.ema_params)
        state = template.replace(ema_params=ema_params)
    else:
        ckpt = Checkpointer(os.path.join(args.model_dir, "checkpoints"))
        state, step = ckpt.restore(template)
    if args.stage != "auto":
        stage = int(args.stage)
    elif npz_stage is not None:
        stage = npz_stage
    else:
        stage, _ = schedule_from_config(config).stage_and_alpha(
            max(step - 1, 0)
        )
    print(f"restored EMA generator from step {step} (sampling at stage "
          f"{stage}, {config.model.stage_resolution(stage)})")
    return Sampler(config, state.ema_params, stage=stage), step, stage, config


def cmd_generate(args) -> int:
    import jax

    from gansynth_tpu.utils.audio_io import write_wav

    config = _build_config(args)
    sampler, step, _, config = _restore_sampler(args, config)
    pitches = [int(p) for p in args.pitches]
    os.makedirs(args.output_dir, exist_ok=True)
    key = jax.random.key(args.seed)
    for i in range(args.num_samples):
        key, sub = jax.random.split(key)
        waves, _ = sampler(sub, pitches)
        for pitch, wave in zip(pitches, np.asarray(waves)):
            out = os.path.join(args.output_dir, f"sample_{i}_pitch{pitch}.wav")
            write_wav(out, wave, config.audio.sample_rate)
            print(out)
    return 0


def cmd_interpolate(args) -> int:
    """Render a latent-space morph (and optionally a pitch glide) between
    two notes — the demo surface the progressive GAN is famous for. The
    whole path batches through ONE jitted generator call; per-step wavs
    plus a crossfaded ``morph.wav`` land in ``--output-dir``."""
    import jax

    from gansynth_tpu.synth.interpolate import (
        crossfade_concat,
        interpolation_labels,
        interpolation_latents,
    )
    from gansynth_tpu.synth.sampler import make_latent_sampler
    from gansynth_tpu.utils.audio_io import write_wav

    loaded = None
    if args.from_exported:
        # Checkpoint-free morphing from a .gsx artifact: needs the
        # latent program (export-model --with-latent); the effective
        # config rides in the header.
        from gansynth_tpu.synth.export import load_sampler_artifact

        try:
            loaded = load_sampler_artifact(args.from_exported)
        except (OSError, ValueError) as e:
            print(f"cannot interpolate from {args.from_exported}: {e}",
                  file=sys.stderr)
            return 2
        if not loaded.has_latent:
            print(
                f"{args.from_exported} ships only the seeded serving "
                "program; re-export with `export-model --with-latent` "
                "to enable artifact-driven interpolation",
                file=sys.stderr,
            )
            return 2
        config, stage = loaded.config(), loaded.stage
    elif args.model_dir:
        config = _build_config(args)
        sampler, _, stage, config = _restore_sampler(args, config)
    else:
        print("interpolate needs --model-dir (or --from-exported ART.gsx)",
              file=sys.stderr)
        return 2
    d = config.model.latent_dim
    # Endpoints derive from per-note seeds exactly like the serving path
    # (synth.make_seeded_sampler): a pure function of (params, seed, pitch).
    za = np.asarray(jax.random.normal(jax.random.key(args.seed_a), (d,)))
    zb = np.asarray(jax.random.normal(jax.random.key(args.seed_b), (d,)))
    z = interpolation_latents(za, zb, args.steps, mode=args.mode)
    pitch_b = args.pitch if args.pitch_b is None else args.pitch_b
    labels = interpolation_labels(
        args.pitch, pitch_b, args.steps,
        config.model.pitch_min, config.model.num_pitches,
    )
    if loaded is not None:
        waves = np.asarray(loaded.latent(z, labels))
    else:
        sample = make_latent_sampler(config, stage)
        waves, _ = sample(sampler.params, z, labels)
        waves = np.asarray(waves)
    os.makedirs(args.output_dir, exist_ok=True)
    for i, t in enumerate(np.linspace(0.0, 1.0, args.steps)):
        out = os.path.join(args.output_dir, f"interp_{i:02d}_t{t:.2f}.wav")
        write_wav(out, waves[i], config.audio.sample_rate)
        print(out)
    overlap = int(round(args.crossfade_ms / 1000.0
                        * config.audio.sample_rate))
    morph = crossfade_concat(waves, overlap)
    out = os.path.join(args.output_dir, "morph.wav")
    write_wav(out, morph, config.audio.sample_rate)
    print(out)
    return 0


def cmd_roundtrip(args) -> int:
    import jax.numpy as jnp

    from gansynth_tpu.data.fixtures import synthesize_note
    from gansynth_tpu.ops import image_to_wave, wave_to_image
    from gansynth_tpu.utils.audio_io import read_wav, write_wav

    audio_cfg = AudioConfig()
    if args.input:
        wave, sr = read_wav(args.input)
        if sr != audio_cfg.sample_rate:
            print(f"error: expected {audio_cfg.sample_rate} Hz, got {sr}",
                  file=sys.stderr)
            return 2
        n = audio_cfg.audio_length
        wave = np.pad(wave[:n], (0, max(0, n - wave.size)))
    else:
        wave = synthesize_note(args.pitch)
    img = wave_to_image(jnp.asarray(wave[None]), audio_cfg)
    recon = np.asarray(image_to_wave(img, audio_cfg))[0]
    err = wave - recon
    snr = 10 * np.log10(np.sum(wave**2) / max(np.sum(err**2), 1e-30))
    print(f"mel-IF image: {tuple(img.shape)}; roundtrip SNR: {snr:.2f} dB "
          f"(mel pseudo-inverse is lossy by design)")
    if args.output:
        write_wav(args.output, recon, audio_cfg.sample_rate)
        print(args.output)
    return 0


def cmd_validate_data(args) -> int:
    import json as _json

    from gansynth_tpu.data.validate import validate_data

    for f in args.data:
        if not os.path.exists(f):
            print(f"error: {f}: no such file", file=sys.stderr)
            return 2
    report = validate_data(
        args.data,
        max_examples=args.max_examples,
        ingest=args.ingest,
        throughput_seconds=args.throughput_seconds,
        train_stage=args.train_stage,
        run_train_check=not args.skip_train_check,
    )
    if args.output:
        with open(args.output, "w") as f:
            _json.dump(report, f, indent=2, sort_keys=True)
    print(_json.dumps(report))
    if not report["ok"]:
        print("validate-data: FAILED (see schema_problems / decode_ok / "
              "train_check_ok above)", file=sys.stderr)
        return 1
    scanned = report["examples_scanned"]
    print(f"validate-data: OK — {scanned} examples scanned, "
          f"{report['trainable_acoustic_in_range']} trainable after the "
          f"acoustic+pitch filters, decode "
          f"{report['decode_examples_per_sec']:.0f} ex/s "
          f"({report['decode_headroom_vs_chip']:.0f}x per-chip demand)")
    return 0


def cmd_evaluate(args) -> int:
    import json as _json

    from gansynth_tpu.evaluation import (
        evaluate_sampler,
        fixture_reference_fn,
        tfrecord_reference_fn,
    )

    config = _build_config(args)
    sampler, step, _, config = _restore_sampler(args, config)
    if args.lsd_data:
        reference_fn = tfrecord_reference_fn(args.lsd_data, config)
    else:
        reference_fn = fixture_reference_fn(
            config.audio.audio_length, config.audio.sample_rate
        )
    metrics = evaluate_sampler(
        sampler,
        pitches=[int(p) for p in args.pitches],
        samples_per_pitch=args.samples_per_pitch,
        sample_rate=config.audio.sample_rate,
        seed=args.seed,
        reference_fn=reference_fn,
        attribution=args.attribution,
    )
    metrics["checkpoint_step"] = step
    if args.output:
        with open(args.output, "w") as f:
            _json.dump(metrics, f, indent=2, sort_keys=True)
        print(f"wrote {args.output}")
    summary = _pitch_accuracy_summary(metrics)
    if summary:
        print(summary)
    print(_json.dumps(metrics))
    return 0


def _pitch_accuracy_summary(metrics: dict) -> str:
    """Per-detector honesty (VERDICT r3): "either" is the UNION of two
    detectors with opposite octave-failure modes — always print the
    per-detector numbers on the same line so the union is never quoted
    alone. Returns "" when the pitch metrics are absent."""
    acc = {
        "hps": metrics.get("pitch_accuracy"),  # harmonic-sum detector
        "acf": metrics.get("pitch_accuracy_acf"),
        "either": metrics.get("pitch_accuracy_either"),
    }
    if any(v is None for v in acc.values()):
        return ""
    line = (
        f"pitch accuracy: HPS {acc['hps']:.1%} / ACF {acc['acf']:.1%}"
        f" / either-detector union {acc['either']:.1%}"
    )
    cep = metrics.get("pitch_accuracy_cepstrum")
    cov = metrics.get("pitch_cepstrum_coverage")
    if cep is not None and cov and cep == cep:  # NaN-safe
        line += f" / cepstrum {cep:.1%} (on {cov:.0%} of notes)"
    return line


def cmd_serve(args) -> int:
    from gansynth_tpu.serve import SynthesisService, serve_forever

    if args.from_exported:
        # Checkpoint-free serving from a .gsx StableHLO artifact: the
        # effective config rides in the artifact header, so no
        # model-dir, checkpoint, or model flags are needed at all.
        from gansynth_tpu.synth.export import load_sampler_artifact

        if args.data_parallel:
            print("--from-exported is a single lowered program; it does "
                  "not compose with --data-parallel", file=sys.stderr)
            return 2
        try:
            loaded = load_sampler_artifact(args.from_exported)
            service = SynthesisService(
                loaded.config(), None, exported=loaded,
                max_batch=args.max_batch,
                max_queue_notes=args.max_queue_notes,
                request_timeout_s=args.request_timeout,
            )
        except (OSError, ValueError) as e:
            print(f"cannot serve {args.from_exported}: {e}",
                  file=sys.stderr)
            return 2
        print(f"artifact from step {loaded.step} (stage {loaded.stage}, "
              f"platforms {','.join(loaded.platforms)}); warmup done")
        serve_forever(service, args.host, args.port)
        return 0
    if not args.model_dir:
        print("serve needs --model-dir (or --from-exported ART.gsx)",
              file=sys.stderr)
        return 2
    config = _build_config(args)
    sampler, step, stage, config = _restore_sampler(args, config)
    mesh = None
    if args.data_parallel:
        from gansynth_tpu.parallel import make_mesh

        mesh = make_mesh()
    service = SynthesisService(
        config, sampler.params, stage=stage, max_batch=args.max_batch,
        max_queue_notes=args.max_queue_notes,
        request_timeout_s=args.request_timeout,
        mesh=mesh,
    )
    print(f"model at step {step}; warmup compile done")
    serve_forever(service, args.host, args.port)
    return 0


def cmd_export_ema(args) -> int:
    """Archive a run: latest full checkpoint -> compact EMA-only .npz."""
    from gansynth_tpu.train.schedule import schedule_from_config
    from gansynth_tpu.train.state import create_train_state
    from gansynth_tpu.utils.checkpoint import Checkpointer, save_ema_npz

    config = _run_config(args, _build_config(args))
    template = create_train_state(config)
    ckpt = Checkpointer(os.path.join(args.model_dir, "checkpoints"))
    state, step = ckpt.restore(template)
    stage, _ = schedule_from_config(config).stage_and_alpha(
        max(step - 1, 0)
    )
    out = args.output or os.path.join(args.model_dir, "ema.npz")
    dtype = None if args.dtype == "float32" else args.dtype
    save_ema_npz(out, state.ema_params, step, stage=stage, dtype=dtype)
    size = os.path.getsize(out) / 2**20
    print(f"wrote {out} ({size:.1f} MiB, step {step}, stage {stage})")
    return 0


def cmd_export_model(args) -> int:
    """Portable serving artifact: lower the whole synthesis program (EMA
    generator + spectral inversion) to serialized StableHLO with the
    weights baked in (synth/export.py). The ``.gsx`` file runs on any
    JAX runtime — no gansynth code or checkpoint on the serving host."""
    from gansynth_tpu.synth.export import (
        load_sampler_artifact,
        save_sampler_artifact,
    )

    config = _build_config(args)
    sampler, step, stage, config = _restore_sampler(args, config)
    out = args.output or os.path.join(args.model_dir, "sampler.gsx")
    platforms = tuple(
        p.strip().lower() for p in args.platforms.split(",") if p.strip()
    )
    if not platforms:
        print("--platforms must name at least one target", file=sys.stderr)
        return 2
    save_sampler_artifact(
        out, config, sampler.params, step, stage=stage,
        platforms=platforms, batch=args.batch,
        with_latent=args.with_latent,
    )
    size = os.path.getsize(out) / 2**20
    batch_desc = "symbolic" if args.batch is None else str(args.batch)
    progs = "seeded+latent" if args.with_latent else "seeded"
    print(f"wrote {out} ({size:.1f} MiB, step {step}, stage {stage}, "
          f"platforms {','.join(platforms)}, batch {batch_desc}, "
          f"programs {progs})")
    if args.check:
        from gansynth_tpu.synth.sampler import make_seeded_sampler

        loaded = load_sampler_artifact(out)
        n = args.batch or 4
        seeds = np.arange(n, dtype=np.int32)
        pitch = np.linspace(
            config.model.pitch_min, config.model.pitch_max, n
        ).astype(np.int32)
        direct = np.asarray(
            make_seeded_sampler(config, stage)(sampler.params, seeds, pitch)
        )
        got = np.asarray(loaded(seeds, pitch))
        rel = float(np.linalg.norm(direct - got)
                    / (np.linalg.norm(direct) + 1e-30))
        # The artifact is a different XLA specialization of the same
        # program; agreement is never bitwise (same delta class as the
        # DP sampler — synth/export.py docstring). The noise floor is
        # set by the compute dtype: ~1e-4 relative under float32,
        # ~1e-1 under bfloat16 (measured 0.088 on the round-3 flagship;
        # waveform correlation stays >= 0.996 and the fundamental is
        # identical — bf16 rounding re-ordered, not a semantic change).
        bound = 0.15 if config.model.compute_dtype == "bfloat16" else 1e-3
        print(f"round-trip relative L2 err vs in-process sampler: "
              f"{rel:.3g} (bound {bound:g} for "
              f"{config.model.compute_dtype})")
        if rel > bound:
            print("ERROR: artifact diverges from the in-process sampler "
                  "beyond the specialization noise bound")
            return 1
    return 0


def cmd_supervise(args) -> int:
    """Watchdog-wrapped training (SURVEY.md §5 failure-detection row):
    run ``train`` as a child process, watch its metrics heartbeat, and
    restart from the latest checkpoint when the heartbeat stalls (the
    observed wedged-dispatch failure mode) or the child crashes."""
    from gansynth_tpu.train.supervisor import Supervisor, model_dir_from_argv

    train_argv = list(args.train_args)
    if train_argv and train_argv[0] == "--":
        train_argv = train_argv[1:]
    model_dir = model_dir_from_argv(train_argv)
    sup = Supervisor(
        train_argv,
        model_dir,
        min_stall_s=args.stall_timeout,
        stall_factor=args.stall_factor,
        startup_grace_s=args.startup_grace,
        max_restarts=args.max_restarts,
        stop_grace_s=args.stop_grace,
    )
    return sup.run()


def cmd_stop(args) -> int:
    """Request a graceful stop of the training run in ``--model-dir``:
    write the one-shot STOP file the training loop polls. The loop
    checkpoints at its next superstep boundary, consumes the file, and
    exits 0 — under ``supervise`` a zero exit means "done", so the
    watchdog does not restart. Stop latency is one superstep
    (single-process) or one ``log_every`` crossing (multi-host)."""
    stop_path = os.path.join(args.model_dir, "STOP")
    if not os.path.isdir(args.model_dir):
        print(f"model dir {args.model_dir} does not exist", flush=True)
        return 2
    with open(stop_path, "w") as f:
        f.write("requested by `gansynth_tpu stop`\n")
    print(f"stop requested: wrote {stop_path}", flush=True)
    if not args.wait:
        return 0
    deadline = time.time() + args.wait
    while time.time() < deadline:
        if not os.path.exists(stop_path):
            print("stop honored (STOP file consumed by the run)")
            return 0
        time.sleep(1.0)
    print(
        f"STOP file still present after {args.wait:.0f}s — no live run "
        "is polling it (already stopped? wrong --model-dir?)"
    )
    return 1


def cmd_fixtures(args) -> int:
    from gansynth_tpu.data import write_synthetic_tfrecords

    path = write_synthetic_tfrecords(
        args.output, num_examples=args.num_examples, seed=args.seed
    )
    print(path)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="gansynth_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="progressive WGAN-GP training")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--data", nargs="*", help="NSynth TFRecord files")
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated fixtures (smoke testing)")
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all visible devices")
    p.add_argument("--multihost", action="store_true",
                   help="pod-slice mode: jax.distributed init + per-process "
                   "data sharding + global mesh (run once per host)")
    p.add_argument("--sample-every", type=int, default=0,
                   help="dump EMA-generator audio samples every N steps")
    p.add_argument("--ingest", default="tf", choices=["tf", "native"],
                   help="TFRecord decode path: tf.data or the first-party "
                   "C++ reader (TensorFlow-free)")
    p.add_argument("--instrument-families", type=int, nargs="+",
                   default=None, metavar="ID",
                   help="keep only these NSynth instrument_family ids "
                   "(0..10) — the other half of the paper's acoustic-"
                   "subset key, next to instrument_source")
    p.add_argument("--mbstd", default="global",
                   choices=["global", "per-replica"],
                   help="minibatch-stddev batch semantics under DP: "
                   "global-batch stats (DP == single-device) or "
                   "per-replica stats (reference-faithful, collective-"
                   "free; see SURVEY.md 2.7)")
    p.add_argument("--device-cache", action="store_true",
                   help="hold the whole decoded dataset in HBM and sample "
                   "batches on device (small datasets; zero host transfer "
                   "per step, stateless resume-exact data stream)")
    p.add_argument("--device-cache-layout", default="replicate",
                   choices=["replicate", "shard"],
                   help="HBM placement of the --device-cache dataset "
                   "under --data-parallel: full copy per device "
                   "(communication-free gather) or example axis split "
                   "across the mesh (cache capacity scales with the "
                   "slice; one small collective per step)")
    _add_common_train_flags(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("generate", help="sample .wav files from a checkpoint")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--pitches", nargs="+", default=["60"],
                   help="MIDI pitches (24..84)")
    p.add_argument("--num-samples", type=int, default=1)
    p.add_argument("--stage", default="auto",
                   help="generator stage to sample at; 'auto' derives the "
                   "trained stage from the checkpoint step + schedule")
    _add_common_train_flags(p)
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser(
        "interpolate",
        help="render a latent morph (timbre) / pitch glide between "
             "two notes as per-step wavs + one crossfaded morph.wav",
    )
    p.add_argument("--model-dir", default=None,
                   help="run directory to restore (or use --from-exported)")
    p.add_argument("--from-exported", default=None, metavar="ART.gsx",
                   help="render from a portable artifact instead of a "
                   "checkpoint — requires one exported with "
                   "`export-model --with-latent`")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--pitch", type=int, default=60,
                   help="MIDI pitch (24..84) of the morph")
    p.add_argument("--pitch-b", type=int, default=None,
                   help="glide the conditioning to this pitch "
                        "(default: fixed --pitch; soft labels in between)")
    p.add_argument("--seed-a", type=int, default=0,
                   help="per-note seed of the starting latent")
    p.add_argument("--seed-b", type=int, default=1,
                   help="per-note seed of the ending latent")
    p.add_argument("--steps", type=int, default=9,
                   help="path length incl. endpoints")
    p.add_argument("--mode", choices=["slerp", "lerp"], default="slerp",
                   help="latent path: great-circle (keeps shell-typical "
                        "norms) or straight chord")
    p.add_argument("--crossfade-ms", type=float, default=250.0,
                   help="equal-power crossfade between adjacent path "
                        "notes in morph.wav (0 = plain concatenation)")
    p.add_argument("--stage", default="auto",
                   help="generator stage to sample at; 'auto' derives the "
                   "trained stage from the checkpoint step + schedule")
    _add_common_train_flags(p)
    p.set_defaults(fn=cmd_interpolate)

    p = sub.add_parser("evaluate",
                       help="pitch-fidelity metrics from a checkpoint")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--pitches", nargs="+", default=[str(p) for p in
                                                    range(24, 85, 12)])
    p.add_argument("--samples-per-pitch", type=int, default=4)
    p.add_argument("--lsd-data", nargs="*", default=None,
                   help="TFRecords of real audio for the log-spectral-"
                   "distance reference (default: synthetic fixture notes)")
    p.add_argument("--attribution", action="store_true",
                   help="add the per-note failure-attribution report: "
                   "95%% CIs, detector-vs-model split, octave direction, "
                   "per-register and per-pitch tables")
    p.add_argument("--output", default=None,
                   help="also write the metrics JSON to this file")
    p.add_argument("--stage", default="auto",
                   help="generator stage to sample at; 'auto' derives the "
                   "trained stage from the checkpoint step + schedule")
    _add_common_train_flags(p)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("serve", help="HTTP synthesis server (POST /synthesize)")
    p.add_argument("--model-dir", default=None,
                   help="run directory to restore (or use --from-exported)")
    p.add_argument("--from-exported", default=None, metavar="ART.gsx",
                   help="serve a portable StableHLO artifact written by "
                   "export-model: checkpoint-free, no model flags needed "
                   "(config rides in the artifact header)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8400)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--max-queue-notes", type=int, default=256,
                   help="backpressure bound: queued notes beyond this get "
                   "HTTP 429 instead of growing the queue without limit")
    p.add_argument("--request-timeout", type=float, default=30.0,
                   help="seconds before a queued/running request fails "
                   "with HTTP 504 (a wedged device fails fast)")
    p.add_argument("--stage", default="auto",
                   help="generator stage; 'auto' derives from checkpoint")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each coalesced synthesis batch over all "
                   "visible devices (params replicated; per-note audio "
                   "unchanged — notes are pure functions of their seeds); "
                   "rungs round up to mesh-size multiples")
    _add_common_train_flags(p)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("export-ema",
                       help="archive the EMA generator as a compact .npz "
                       "(generate/evaluate/serve load it when no full "
                       "checkpoint is present)")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--output", default=None,
                   help="output path (default: <model-dir>/ema.npz)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float16"],
                   help="leaf storage dtype; float16 halves the archive "
                   "(restore re-casts to float32; audible effect is below "
                   "the bf16 inference noise floor)")
    _add_common_train_flags(p)
    p.set_defaults(fn=cmd_export_ema)

    p = sub.add_parser(
        "export-model",
        help="portable serving artifact: the whole synthesis program "
        "(EMA generator + spectral inversion) as serialized StableHLO "
        "with weights baked in — runs on any JAX runtime without "
        "gansynth code or checkpoints",
    )
    p.add_argument("--model-dir", required=True)
    p.add_argument("--output", default=None,
                   help="output path (default: <model-dir>/sampler.gsx)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets embedded in the "
                   "artifact (dispatched on the runtime backend)")
    p.add_argument("--batch", type=int, default=None,
                   help="pin a static batch size (default: symbolic — any "
                   "batch size at call time)")
    p.add_argument("--with-latent", action="store_true",
                   help="also ship the latent-space program so "
                   "`interpolate --from-exported` works checkpoint-free "
                   "(~2x file size: constants are inlined per program)")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and verify its audio against "
                   "the in-process sampler within the specialization-noise "
                   "bound (1e-3 relative f32, 0.15 bf16 — never bitwise: "
                   "the AOT module is a different XLA specialization)")
    p.add_argument("--stage", default="auto",
                   help="generator stage to export; 'auto' derives the "
                   "trained stage from the checkpoint step + schedule")
    _add_common_train_flags(p)
    p.set_defaults(fn=cmd_export_model)

    p = sub.add_parser(
        "supervise",
        help="watchdog-wrapped training: restart from the latest "
        "checkpoint when the metrics heartbeat stalls (wedged device "
        "dispatch) or the child crashes",
    )
    p.add_argument("--stall-timeout", type=float, default=300.0,
                   help="minimum seconds of heartbeat silence that count "
                   "as a stall (must cover a stage-boundary recompile)")
    p.add_argument("--stall-factor", type=float, default=8.0,
                   help="stall limit = max(stall-timeout, factor x median "
                   "recent heartbeat interval)")
    p.add_argument("--startup-grace", type=float, default=1800.0,
                   help="seconds allowed before the FIRST heartbeat "
                   "(cold-compile window)")
    p.add_argument("--max-restarts", type=int, default=3)
    p.add_argument("--stop-grace", type=float, default=600.0,
                   help="on SIGTERM (graceful stop), seconds to wait for "
                   "the child to checkpoint and exit before killing it")
    p.add_argument("train_args", nargs=argparse.REMAINDER,
                   help="arguments forwarded to the train subcommand "
                   "(must include --model-dir); prefix with --")
    p.set_defaults(fn=cmd_supervise)

    p = sub.add_parser(
        "stop",
        help="gracefully stop a running train/supervise: checkpoint at "
        "the next superstep boundary, then exit 0 (no restart)",
    )
    p.add_argument("--model-dir", required=True,
                   help="the running train's --model-dir")
    p.add_argument("--wait", type=float, default=0.0, metavar="SECONDS",
                   help="block until the run consumes the request "
                   "(0 = return immediately)")
    p.set_defaults(fn=cmd_stop)

    p = sub.add_parser("roundtrip", help="wave -> mel-IF -> wave check")
    p.add_argument("--input", help="16 kHz mono wav (default: synthetic note)")
    p.add_argument("--pitch", type=int, default=60)
    p.add_argument("--output", help="write reconstructed wav here")
    p.set_defaults(fn=cmd_roundtrip)

    p = sub.add_parser(
        "validate-data",
        help="real-data readiness gate: schema completeness, pitch/family "
        "distributions, decode throughput vs device demand, and one real "
        "training superstep + spectral roundtrip on the files (run this "
        "the day real NSynth TFRecords appear, before any training run)",
    )
    p.add_argument("--data", nargs="+", required=True, metavar="TFRECORD")
    p.add_argument("--max-examples", type=int, default=2048,
                   help="examples to scan for schema/distribution checks")
    p.add_argument("--ingest", default="tfdata",
                   choices=["tfdata", "native"],
                   help="decode path for the throughput + training checks")
    p.add_argument("--throughput-seconds", type=float, default=3.0,
                   help="sustained-decode measurement window")
    p.add_argument("--train-stage", type=int, default=2,
                   help="ladder stage for the one-superstep check (low "
                   "stages compile in seconds)")
    p.add_argument("--skip-train-check", action="store_true",
                   help="schema + throughput only (no device compile)")
    p.add_argument("--output", default=None,
                   help="also write the report JSON to this file")
    p.set_defaults(fn=cmd_validate_data)

    p = sub.add_parser("fixtures", help="write synthetic NSynth TFRecords")
    p.add_argument("--output", required=True)
    p.add_argument("--num-examples", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_fixtures)

    args = parser.parse_args(argv)
    # This machine's sitecustomize force-registers the TPU backend at
    # interpreter startup, so the JAX_PLATFORMS env var alone cannot
    # redirect a CLI child process to CPU; honor an explicit override
    # through the config API (used by the supervisor tests and handy for
    # CPU smoke runs: GANSYNTH_PLATFORM=cpu).
    platform = os.environ.get("GANSYNTH_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    from gansynth_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
