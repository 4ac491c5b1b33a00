"""North-star benchmark (BASELINE.md / SURVEY.md §6). Prints ONE JSON line.

Default invocation measures BOTH headline metrics and emits them in one
JSON object:

- latent+pitch -> waveform synthesis throughput, x-real-time per chip, on
  the fully-jitted full-resolution path (generator at 128x1024 + mel
  pseudo-inverse + phase cumsum + iSTFT), steady-state; and
- full WGAN-GP training steps/sec at the final 128x1024 stage, with an
  MFU estimate (XLA's own per-program FLOP count / wall time / peak chip
  FLOPs).

    {"metric": "synthesis_x_realtime_per_chip", "value": N,
     "unit": "x_realtime", "vs_baseline": N / 50,
     "train_steps_per_sec": M, "train_examples_per_sec": E,
     "train_mfu": F, ...}

Baseline: the target from BASELINE.json — >= 50x real-time per chip (the
reference publishes no numbers of its own; 50x is the binding bar).

Timing discipline (CLAUDE.md): every measurement amortizes many
iterations inside ONE lax.scan'd device program and synchronizes through
a fetched scalar checksum — on this machine's tunneled TPU backend,
``block_until_ready`` does not block and per-dispatch host timing is
meaningless.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# Peak dense-matmul throughput per chip, used for the MFU denominator.
# bf16 peaks (f32 runs through the same MXU via bf16x3 passes; MFU is
# reported against the bf16 peak either way). Unknown kinds report a NULL
# MFU (peak_flops_known: false) rather than a silently-wrong number.
PEAK_FLOPS = {
    "tpu v5 lite": 197e12,
    "tpu v5e": 197e12,
    "tpu v4": 275e12,
    "tpu v5": 459e12,
    "tpu v5p": 459e12,
    "tpu v6 lite": 918e12,
    "tpu v6e": 918e12,
}


def _cost_of(compiled) -> dict:
    """XLA's cost analysis for a compiled program ({} when unavailable)."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return dict(cost)
    except Exception:
        return {}


def _flops_of(compiled) -> float:
    """XLA's FLOP count for a compiled program (0.0 when unavailable)."""
    return float(_cost_of(compiled).get("flops", 0.0))


def bench_train(args, jax, jnp, batch=None) -> dict:
    """Train-step metrics: steps/s + MFU at the final 128x1024 stage.

    K steps are fused into one lax.scan program (the framework's own
    superstep); sync is a fetched loss scalar. ``batch`` overrides
    ``args.train_batch`` (the batch-sweep entries reuse this body).
    """
    from gansynth_tpu.train import (
        create_train_state,
        make_superstep,
        make_train_step,
    )
    from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

    train_batch = args.train_batch if batch is None else batch
    config = Config(
        model=ModelConfig(compute_dtype=args.dtype,
                          conv_kernel=args.conv_kernel),
        train=TrainConfig(batch_size=train_batch,
                          fused_critic=args.fused_critic),
    )
    stage = (
        config.model.num_stages - 1
        if args.train_stage < 0
        else args.train_stage
    )
    state = create_train_state(config, seed=0)
    rng = np.random.default_rng(0)
    k = args.train_scan_iters
    waves = jnp.asarray(
        (0.1 * rng.standard_normal(
            (k, train_batch, config.audio.audio_length)
        )).astype(np.float32)
    )
    pitches = jnp.asarray(
        rng.integers(24, 85, (k, train_batch)), jnp.int32
    )
    alphas = jnp.ones(k, jnp.float32)
    step = jax.jit(make_superstep(config, stage), donate_argnums=0)

    lowered = step.lower(state, waves, pitches, alphas)
    compiled = lowered.compile()
    # FLOPs from the SINGLE-step program: cost_analysis counts a while
    # body once, not times its trip count, so dividing the fused
    # program's count by k under-reports ~k-fold (r1's "MFU 4.5%" bug).
    single = jax.jit(make_train_step(config, stage)).lower(
        state, waves[0], pitches[0], alphas[0]
    ).compile()
    single_cost = _cost_of(single)
    flops_per_step = float(single_cost.get("flops", 0.0))
    # Memory traffic of one step (XLA's "bytes accessed"): the numerator
    # of the HBM-roofline argument (DESIGN.md §2c "bandwidth-bound at
    # ~75% of roofline") — carried in the bench JSON so the claim
    # travels with the measurement.
    bytes_per_step = float(single_cost.get("bytes accessed", 0.0))

    state, metrics = compiled(state, waves, pitches, alphas)  # warmup
    assert np.isfinite(float(metrics["d_loss"]))  # fetched-scalar sync
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        state, metrics = compiled(state, waves, pitches, alphas)
        assert np.isfinite(float(metrics["d_loss"]))
        times.append(time.perf_counter() - t0)
    per_step = float(np.median(times)) / k

    # MFU is only meaningful against a KNOWN peak: report the device kind
    # and emit a null MFU (flagged) rather than silently assuming a v5e
    # peak on unrecognized hardware.
    device_kind = jax.devices()[0].device_kind.lower()
    peak = PEAK_FLOPS.get(device_kind)
    peak_known = peak is not None
    mfu = (
        (flops_per_step / per_step) / peak
        if (flops_per_step and peak_known)
        else None
    )
    return {
        "train_steps_per_sec": round(1.0 / per_step, 3),
        "train_examples_per_sec": round(train_batch / per_step, 2),
        "train_batch": train_batch,
        "train_stage": stage,
        "train_fused_critic": args.fused_critic,
        "train_conv_kernel": args.conv_kernel,
        "train_dtype": args.dtype,
        "train_flops_per_step": flops_per_step or None,
        "train_bytes_per_step": bytes_per_step or None,
        "train_hbm_gbytes_per_sec": (
            round(bytes_per_step / per_step / 1e9, 1)
            if bytes_per_step else None
        ),
        "train_mfu": round(mfu, 4) if mfu is not None else None,
        "device_kind": device_kind,
        "peak_flops_known": peak_known,
        "train_peak_flops_assumed": peak,
    }


def bench_ingest(args) -> dict:
    """Host-ingest throughput (SURVEY.md §7 hard part 4, measured).

    Decodes NSynth-schema TFRecords through BOTH ingest paths — the
    tf.data pipeline and the first-party C++ reader — with the full
    training contract (parse + pitch filter + shuffle + batch) and
    reports examples/s per path. The headline `ingest_examples_per_sec`
    is the better path (the trainer selects either via `--ingest`);
    `ingest_headroom_vs_chip` divides it by the measured per-chip device
    demand (train_examples_per_sec when the train bench ran in the same
    invocation, else the recorded round-4 demand of 66 ex/s/chip). Pod
    scaling note: each host decodes only its shard of the global batch
    (num_shards=process_count), so per-HOST demand equals per-chip
    demand x chips-per-host; the headroom here is the single-host,
    whole-file bound.
    """
    import os
    import tempfile

    from gansynth_tpu.data import (
        make_native_iterator,
        make_nsynth_iterator,
        write_synthetic_tfrecords,
    )
    from gansynth_tpu.utils.config import Config

    config = Config()
    n_examples = args.ingest_examples
    path = os.path.join(
        tempfile.gettempdir(), f"gansynth_ingest_bench_{n_examples}.tfrecord"
    )
    if not os.path.exists(path):
        write_synthetic_tfrecords(path, num_examples=n_examples, seed=0)

    batch = 64
    n_batches = max(2 * n_examples // batch, 8)  # ~2 epochs per timing

    def eps(make_iterator) -> float:
        it = make_iterator(
            [path], config, acoustic_only=False, batch_size=batch,
            shuffle=True, repeat=True, seed=0,
        )
        next(it)  # warmup: open file, fill shuffle buffer, first batch
        t0 = time.perf_counter()
        for _ in range(n_batches):
            wave, pitch = next(it)
        dt = time.perf_counter() - t0
        assert wave.shape == (batch, config.audio.audio_length)
        return n_batches * batch / dt

    tfdata = eps(make_nsynth_iterator)
    native = eps(make_native_iterator)
    return {
        "ingest_tfdata_examples_per_sec": round(tfdata, 1),
        "ingest_native_examples_per_sec": round(native, 1),
        "ingest_examples_per_sec": round(max(tfdata, native), 1),
        "ingest_bench_examples": n_examples,
    }


def bench_synthesis(args, jax, jnp, config) -> dict:
    from gansynth_tpu.models import Generator
    from gansynth_tpu.ops.spectral import image_to_wave
    from gansynth_tpu.train.step import pitch_to_onehot

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
    return {
        "metric": "synthesis_x_realtime_per_chip",
        "value": round(x_rt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(x_rt / 50.0, 3),
    }


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
    parser.add_argument("--metric", default="all",
                        choices=["all", "synthesis", "train", "ingest"])
    parser.add_argument("--train-batch-sweep", default="4,8,16",
                        help="comma-separated per-device batch sizes to "
                        "sweep in the train bench (pins the 'examples/s "
                        "flat with batch' bandwidth-bound evidence to a "
                        "measurement; '' disables the sweep)")
    parser.add_argument("--ingest-examples", type=int, default=512,
                        help="fixture size for the host-ingest decode "
                        "bench (~256 KiB/example on disk)")
    parser.add_argument("--train-batch", type=int, default=8)
    parser.add_argument("--train-stage", type=int, default=-1,
                        help="ladder stage to bench (-1 = final 128x1024); "
                        "with --train-batch this measures the per-stage "
                        "batch schedule (TrainConfig.stage_batch_sizes)")
    parser.add_argument("--fused-critic", default="none",
                        choices=["none", "pair", "all"],
                        help="critic-pass batching experiment (same math; "
                        "see TrainConfig.fused_critic)")
    parser.add_argument("--train-scan-iters", type=int, default=10,
                        help="train steps fused per timed device program")
    parser.add_argument("--conv-kernel", default="xla",
                        choices=["xla", "pallas"],
                        help="3x3 trunk conv lowering for the train bench "
                        "(ModelConfig.conv_kernel; pallas = VMEM-im2col)")
    parser.add_argument("--synthesis-kernel", default="matrix",
                        choices=["matrix", "xla", "pallas"],
                        help="spectral synthesis lowering to bench: "
                        "'matrix' measures BOTH (on TPU) and headlines "
                        "the winner — the accept-or-reject discipline of "
                        "SURVEY.md §7 step 6 applied to the flagship path")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from gansynth_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    from gansynth_tpu.utils.config import AudioConfig, Config, ModelConfig

    record = {}
    if args.metric in ("all", "synthesis"):
        # Kernel matrix (VERDICT r3 item 4): measure the flagship path
        # under BOTH spectral-synthesis lowerings — the XLA fusion of the
        # algebraically-collapsed path and the fused Pallas spectrum
        # kernel — and headline the winner, so the recorded BENCH json
        # always carries the comparison. Compiled Pallas requires a TPU;
        # on CPU only the XLA lowering is measured.
        if args.synthesis_kernel == "matrix":
            kernels = (
                ["xla"] if jax.default_backend() == "cpu"
                else ["xla", "pallas"]
            )
        else:
            kernels = [args.synthesis_kernel]
        by_kernel = {}
        for kern in kernels:
            cfg_k = Config(
                model=ModelConfig(compute_dtype=args.dtype),
                audio=AudioConfig(synthesis_kernel=kern),
            )
            by_kernel[kern] = bench_synthesis(args, jax, jnp, cfg_k)
        best = max(by_kernel, key=lambda k: by_kernel[k]["value"])
        record.update(by_kernel[best])
        record["synthesis_kernel"] = best
        if len(by_kernel) > 1:
            record["synthesis_x_realtime_by_kernel"] = {
                k: v["value"] for k, v in by_kernel.items()
            }
    if args.metric in ("all", "train"):
        train_record = bench_train(args, jax, jnp)
        if args.metric == "train":
            per = 1.0 / train_record["train_steps_per_sec"]
            record.update({
                "metric": "train_steps_per_sec_128x1024",
                "value": train_record["train_steps_per_sec"],
                "unit": f"steps/s (global batch {args.train_batch})",
                "vs_baseline": round(args.train_batch / per, 2),
            })
        record.update(train_record)
        # Batch sweep (VERDICT r4 item 8): examples/s across per-device
        # batches pins the bandwidth-bound diagnosis ("flat 8->16") to a
        # committed measurement instead of prose.
        sweep = [
            int(b) for b in args.train_batch_sweep.split(",") if b
        ] if args.train_batch_sweep else []
        sweep_out = {}
        for b in sweep:
            if b == train_record["train_batch"]:
                r = train_record
            else:
                r = bench_train(args, jax, jnp, batch=b)
            sweep_out[str(b)] = {
                "steps_per_sec": r["train_steps_per_sec"],
                "examples_per_sec": r["train_examples_per_sec"],
            }
        if sweep_out:
            record["train_batch_sweep"] = sweep_out
    if args.metric in ("all", "ingest"):
        ingest = bench_ingest(args)
        demand = record.get("train_examples_per_sec") or 66.0
        ingest["ingest_headroom_vs_chip"] = round(
            ingest["ingest_examples_per_sec"] / demand, 1
        )
        if args.metric == "ingest":
            record.update({
                "metric": "ingest_examples_per_sec",
                "value": ingest["ingest_examples_per_sec"],
                "unit": "examples/s (host decode)",
                "vs_baseline": ingest["ingest_headroom_vs_chip"],
            })
        record.update(ingest)
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
