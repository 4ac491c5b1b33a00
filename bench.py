"""North-star benchmark (BASELINE.md / SURVEY.md §6). Prints ONE JSON line.

Default metric: latent+pitch -> waveform synthesis throughput, x-real-time
per chip, on the fully-jitted full-resolution path (generator at 128x1024
+ mel pseudo-inverse + phase cumsum + iSTFT), steady-state:

    {"metric": "synthesis_x_realtime_per_chip", "value": N,
     "unit": "x_realtime", "vs_baseline": N / 50}

Baseline: the target from BASELINE.json — >= 50x real-time per chip (the
reference publishes no numbers of its own; 50x is the binding bar).

``--metric train`` instead measures the second north-star: full WGAN-GP
training steps/sec at the final 128x1024 stage (vs_baseline is examples/s
— no published reference number exists to normalize against).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_train(args, jax, jnp) -> int:
    """Second north-star: full-res WGAN-GP steps/sec on one chip."""
    from gansynth_tpu.train import create_train_state, make_train_step
    from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

    config = Config(
        model=ModelConfig(compute_dtype=args.dtype),
        train=TrainConfig(batch_size=args.train_batch),
    )
    stage = config.model.num_stages - 1
    state = create_train_state(config, seed=0)
    rng = np.random.default_rng(0)
    wave = jnp.asarray(
        (0.1 * rng.standard_normal(
            (args.train_batch, config.audio.audio_length)
        )).astype(np.float32)
    )
    pitch = jnp.asarray(rng.integers(24, 85, args.train_batch), jnp.int32)
    step = jax.jit(make_train_step(config, stage), donate_argnums=0)

    state, metrics = step(state, wave, pitch, jnp.float32(1.0))  # compile
    float(metrics["d_loss"])
    k = 6
    t0 = time.perf_counter()
    for _ in range(k):
        state, metrics = step(state, wave, pitch, jnp.float32(1.0))
    assert np.isfinite(float(metrics["d_loss"]))  # sync
    per = (time.perf_counter() - t0) / k
    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec_128x1024",
                "value": round(1.0 / per, 3),
                "unit": f"steps/s (global batch {args.train_batch})",
                "vs_baseline": round(args.train_batch / per, 2),
            }
        )
    )
    return 0


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128,
                        help="batch 128 is the measured throughput sweet "
                        "spot on v5e (64: ~5.8k xRT, 128: ~7.9k, 256: ~7.7k)")
    parser.add_argument("--scan-iters", type=int, default=8,
                        help="synthesis batches per timed device program")
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="MXU compute dtype (params/spectral stay f32; "
                        "tests assert bf16~f32 output agreement)")
    parser.add_argument("--metric", default="synthesis",
                        choices=["synthesis", "train"])
    parser.add_argument("--train-batch", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from gansynth_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    from gansynth_tpu.models import Generator
    from gansynth_tpu.ops.spectral import image_to_wave
    from gansynth_tpu.train.step import pitch_to_onehot
    from gansynth_tpu.utils.config import AudioConfig, Config, ModelConfig

    # TPU-tuned synthesis: fused Pallas spectrum kernel + matmul iDFT.
    # (Compiled Pallas requires a TPU; fall back to the XLA lowering when
    # someone runs the bench on CPU.)
    kernel = "pallas" if jax.default_backend() != "cpu" else "xla"
    config = Config(
        model=ModelConfig(compute_dtype=args.dtype),
        audio=AudioConfig(synthesis_kernel=kernel),
    )

    if args.metric == "train":
        return bench_train(args, jax, jnp)
    m = config.model
    stage = m.num_stages - 1
    g = Generator(m)

    rng = np.random.default_rng(0)
    params = g.init(
        jax.random.key(0),
        jnp.zeros((1, m.latent_dim), jnp.float32),
        jnp.zeros((1, m.num_pitches), jnp.float32),
        stage,
    )

    def synthesize(z, pitch):
        labels = pitch_to_onehot(pitch, config)
        image = g.apply(params, z, labels, stage, jnp.float32(1.0))
        return image_to_wave(image, config.audio)

    # Amortized on-device measurement: scan `scan_iters` synthesis batches
    # (fresh latents each, so no CSE collapses the loop) inside ONE device
    # program, returning only a scalar checksum. This times chip execution
    # rather than host<->device transfer or per-dispatch overhead — on this
    # machine the TPU is reached through a tunnel whose `block_until_ready`
    # does not block and whose array transfers are orders slower than the
    # chip, so per-call host timing is meaningless.
    pitch = jnp.asarray(rng.integers(24, 85, args.batch), jnp.int32)

    @jax.jit
    def synth_many(key, pitch):
        def body(carry, k):
            z = jax.random.normal(k, (args.batch, m.latent_dim), jnp.float32)
            wave = synthesize(z, pitch)
            return carry + jnp.sum(wave[:, :: 4096]), None
        keys = jax.random.split(key, args.scan_iters)
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return acc

    # compile + warmup (fetch the scalar: the only reliable barrier here)
    float(synth_many(jax.random.key(0), pitch))

    times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        checksum = float(synth_many(jax.random.key(i), pitch))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(checksum)

    seconds_of_audio = (
        args.scan_iters
        * args.batch
        * (config.audio.audio_length / config.audio.sample_rate)
    )
    wall = float(np.median(times))
    x_rt = seconds_of_audio / wall
    print(
        json.dumps(
            {
                "metric": "synthesis_x_realtime_per_chip",
                "value": round(x_rt, 2),
                "unit": "x_realtime",
                "vs_baseline": round(x_rt / 50.0, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
