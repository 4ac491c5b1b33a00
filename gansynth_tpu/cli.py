"""Command-line entry point (SURVEY.md §2.6, C1–C3).

Subcommands mirror the reference's modes plus the framework's own tooling:

- ``train``     — progressive WGAN-GP training from NSynth TFRecords (or
                  synthetic fixtures with ``--synthetic``), checkpointed
                  and resumable.
- ``generate``  — restore the EMA generator and write pitch-conditioned
                  ``.wav`` samples (C3).
- ``roundtrip`` — wave -> mel-IF image -> wave fidelity check on a WAV
                  file or a synthetic tone (driver config 1).
- ``fixtures``  — write synthetic NSynth-like TFRecords.

Run as ``python -m gansynth_tpu.cli <subcommand> ...``.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

from gansynth_tpu.utils.config import AudioConfig, Config, ModelConfig, TrainConfig


def _build_config(args) -> Config:
    train = TrainConfig(
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        fade_steps=args.fade_steps,
        stable_steps=args.stable_steps,
        seed=args.seed,
        checkpoint_every=args.checkpoint_every,
        log_every=args.log_every,
        sample_every=getattr(args, "sample_every", 0),
    )
    model = ModelConfig(
        latent_dim=args.latent_dim,
        fmap_base=args.fmap_base,
        fmap_max=args.fmap_max,
        compute_dtype=args.compute_dtype,
    )
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    return Config(model=model, train=train)


def _add_common_train_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--batch-size", type=int, default=8)
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
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint-every", type=int, default=2000)
    p.add_argument("--log-every", type=int, default=100)


def cmd_train(args) -> int:
    from gansynth_tpu.data import make_nsynth_iterator, write_synthetic_tfrecords
    from gansynth_tpu.train.loop import train

    config = _build_config(args)
    files = list(args.data or [])
    if args.synthetic and not files:
        path = os.path.join(tempfile.gettempdir(), "gansynth_fixtures.tfrecord")
        write_synthetic_tfrecords(path, num_examples=256, seed=config.train.seed)
        files = [path]
    if not files:
        print("error: pass --data <tfrecord...> or --synthetic", file=sys.stderr)
        return 2

    if args.ingest == "native":
        from gansynth_tpu.data import make_native_iterator as make_iterator
    else:
        make_iterator = make_nsynth_iterator
    data = make_iterator(
        files, config, acoustic_only=not args.synthetic, seed=config.train.seed
    )
    state = train(
        config,
        data,
        num_steps=args.num_steps,
        workdir=args.model_dir,
        use_mesh=args.data_parallel,
    )
    print(f"trained to step {int(state.step)}; checkpoints in "
          f"{args.model_dir}/checkpoints")
    return 0


def _restore_sampler(args, config):
    """Restore the EMA generator and build a sampler at the right stage.

    A checkpoint taken mid-ladder has untrained blocks above its stage;
    sampling must run at the TRAINED stage (derived from the restored
    step via the schedule; waveforms are synthesized from the
    nearest-upsampled full-resolution image below the final stage).
    ``--stage`` overrides.
    """
    from gansynth_tpu.synth import Sampler
    from gansynth_tpu.train.schedule import ProgressiveSchedule
    from gansynth_tpu.train.state import create_train_state
    from gansynth_tpu.utils.checkpoint import Checkpointer

    template = create_train_state(config)
    ckpt = Checkpointer(os.path.join(args.model_dir, "checkpoints"))
    state, step = ckpt.restore(template)
    if args.stage == "auto":
        schedule = ProgressiveSchedule(
            num_stages=config.model.num_stages,
            fade_steps=config.train.fade_steps,
            stable_steps=config.train.stable_steps,
        )
        stage, _ = schedule.stage_and_alpha(max(step - 1, 0))
    else:
        stage = int(args.stage)
    print(f"restored EMA generator from step {step} (sampling at stage "
          f"{stage}, {config.model.stage_resolution(stage)})")
    return Sampler(config, state.ema_params, stage=stage), step, stage


def cmd_generate(args) -> int:
    import jax

    from gansynth_tpu.utils.audio_io import write_wav

    config = _build_config(args)
    sampler, step, _ = _restore_sampler(args, config)
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


def cmd_evaluate(args) -> int:
    import json as _json

    from gansynth_tpu.evaluation import evaluate_sampler

    config = _build_config(args)
    sampler, step, _ = _restore_sampler(args, config)
    metrics = evaluate_sampler(
        sampler,
        pitches=[int(p) for p in args.pitches],
        samples_per_pitch=args.samples_per_pitch,
        sample_rate=config.audio.sample_rate,
        seed=args.seed,
    )
    metrics["checkpoint_step"] = step
    print(_json.dumps(metrics))
    return 0


def cmd_serve(args) -> int:
    from gansynth_tpu.serve import SynthesisService, serve_forever

    config = _build_config(args)
    sampler, step, stage = _restore_sampler(args, config)
    service = SynthesisService(
        config, sampler.params, stage=stage, max_batch=args.max_batch
    )
    print(f"model at step {step}; warmup compile done")
    serve_forever(service, args.host, args.port)
    return 0


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
    p.add_argument("--sample-every", type=int, default=0,
                   help="dump EMA-generator audio samples every N steps")
    p.add_argument("--ingest", default="tf", choices=["tf", "native"],
                   help="TFRecord decode path: tf.data or the first-party "
                   "C++ reader (TensorFlow-free)")
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

    p = sub.add_parser("evaluate",
                       help="pitch-fidelity metrics from a checkpoint")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--pitches", nargs="+", default=[str(p) for p in
                                                    range(24, 85, 12)])
    p.add_argument("--samples-per-pitch", type=int, default=4)
    p.add_argument("--stage", default="auto",
                   help="generator stage to sample at; 'auto' derives the "
                   "trained stage from the checkpoint step + schedule")
    _add_common_train_flags(p)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("serve", help="HTTP synthesis server (POST /synthesize)")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8400)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--stage", default="auto",
                   help="generator stage; 'auto' derives from checkpoint")
    _add_common_train_flags(p)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("roundtrip", help="wave -> mel-IF -> wave check")
    p.add_argument("--input", help="16 kHz mono wav (default: synthetic note)")
    p.add_argument("--pitch", type=int, default=60)
    p.add_argument("--output", help="write reconstructed wav here")
    p.set_defaults(fn=cmd_roundtrip)

    p = sub.add_parser("fixtures", help="write synthetic NSynth TFRecords")
    p.add_argument("--output", required=True)
    p.add_argument("--num-examples", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_fixtures)

    args = parser.parse_args(argv)
    from gansynth_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
