"""Stage-6 train-step profile (VERDICT r1 item 5): where do the 121 ms go?

Two complementary views, both honest on the tunneled backend
(fetched-scalar sync, scan-amortized):

1. component timing — separately compiled scanned programs for the
   spectral frontend, D forward, D update (3 critic passes + 2nd-order
   GP), G update, and the full step; reported per-step.
2. jax.profiler trace attempt — written to --trace-dir when the backend
   supports it (inspect with TensorBoard/Perfetto); failure is reported,
   not fatal.

Also measures the dft_mode=matmul frontend variant inside the D update
(NEXT.md r1 perf candidate) so the default is chosen on evidence.

Run only when no other TPU job is active (single-tenant tunnel).
"""

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from gansynth_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from gansynth_tpu.models import Discriminator, Generator
from gansynth_tpu.ops.spectral import wave_to_image
from gansynth_tpu.train import create_train_state, make_superstep
from gansynth_tpu.train.step import pitch_to_onehot
from gansynth_tpu.utils.config import AudioConfig, Config, ModelConfig, TrainConfig


def timed(fn, x, iters=24, repeats=3):
    """Median per-iteration seconds of ``fn(x)`` amortized in one scan.

    The input is perturbed by the (output-derived) carry each iteration,
    making the body loop-VARIANT — with a constant input XLA hoists the
    whole computation out of the scan and the probe times one execution
    divided by ``iters`` (observed: components summing to 8 ms under a
    122 ms step). The 1e-30 nudge is far below f32 resolution of O(1)
    data, so the measured program is numerically the real one.
    """
    @jax.jit
    def many(x):
        def body(c, _):
            out = fn(x + (c * 1e-30).astype(x.dtype))
            leaf = jax.tree.leaves(out)[0]
            red = jnp.sum(leaf.astype(jnp.float32).ravel()[::512])
            return red, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc

    float(many(x))  # compile+warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(many(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--trace-dir", default="/tmp/gansynth_trace")
    args = p.parse_args()

    config = Config(
        model=ModelConfig(compute_dtype=args.dtype),
        train=TrainConfig(batch_size=args.batch),
    )
    stage = config.model.num_stages - 1
    m = config.model
    g, d = Generator(m), Discriminator(m)
    state = create_train_state(config, seed=0)
    rng = np.random.default_rng(0)
    wave = jnp.asarray(
        (0.1 * rng.standard_normal((args.batch, config.audio.audio_length))
         ).astype(np.float32))
    pitch = jnp.asarray(rng.integers(24, 85, args.batch), jnp.int32)
    labels = pitch_to_onehot(pitch, config)
    z = jnp.asarray(rng.standard_normal((args.batch, m.latent_dim)),
                    jnp.float32)
    image = g.apply(state.g_params, z, labels, stage, jnp.float32(1.0))
    image = jax.block_until_ready(image)

    results = {}

    # -- components --
    results["frontend_fft"] = timed(
        lambda w: wave_to_image(w, config.audio), wave)
    audio_mm = dataclasses.replace(config.audio, dft_mode="matmul")
    results["frontend_matmul"] = timed(
        lambda w: wave_to_image(w, audio_mm), wave)
    results["g_forward"] = timed(
        lambda zz: g.apply(state.g_params, zz, labels, stage,
                           jnp.float32(1.0)), z)
    results["d_forward"] = timed(
        lambda im: d.apply(state.d_params, im, stage, jnp.float32(1.0))[0],
        image)

    def d_update_loss(d_params, im):
        from gansynth_tpu.train import losses
        def critic_fn(x):
            return d.apply(d_params, x, stage, jnp.float32(1.0))
        c_real, logits = critic_fn(im)
        c_fake, _ = critic_fn(im[::-1])
        gp = losses.gradient_penalty(critic_fn, im, im[::-1],
                                     jax.random.key(0))
        return (jnp.mean(c_fake) - jnp.mean(c_real) + 10.0 * gp
                + 10.0 * losses.pitch_cross_entropy(logits, labels))

    results["d_update_grad_3pass_gp"] = timed(
        lambda im: jax.grad(d_update_loss)(state.d_params, im), image)

    def g_update_loss(g_params, zz):
        fake = g.apply(g_params, zz, labels, stage, jnp.float32(1.0))
        c, logits = d.apply(state.d_params, fake, stage, jnp.float32(1.0))
        from gansynth_tpu.train import losses
        return -jnp.mean(c) + 10.0 * losses.pitch_cross_entropy(logits, labels)

    results["g_update_grad"] = timed(
        lambda zz: jax.grad(g_update_loss)(state.g_params, zz), z)

    # -- full fused step (the production program) --
    superstep = jax.jit(make_superstep(config, stage))
    alphas = jnp.ones(16, jnp.float32)
    waves_k = jnp.broadcast_to(wave, (16,) + wave.shape)
    pitch_k = jnp.broadcast_to(pitch, (16,) + pitch.shape)
    compiled = superstep.lower(state, waves_k, pitch_k, alphas).compile()
    s, mets = compiled(state, waves_k, pitch_k, alphas)
    float(mets["d_loss"])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        s, mets = compiled(s, waves_k, pitch_k, alphas)
        float(mets["d_loss"])
        ts.append(time.perf_counter() - t0)
    results["full_step"] = min(ts) / 16

    for k, v in results.items():
        print(f"{k:28s} {v * 1000:8.2f} ms", flush=True)

    # -- roofline: is the step compute- or bandwidth-limited, and how close
    #    to either ceiling? XLA's own cost model supplies FLOPs and HBM
    #    bytes for the compiled program (v5e: ~197 TFLOP/s bf16, ~819 GB/s).
    try:
        # Cost from the SINGLE-step program: cost_analysis counts a while
        # body once (not x trip count), so the fused program's numbers do
        # NOT divide by 16.
        from gansynth_tpu.train import make_train_step

        single = jax.jit(make_train_step(config, stage)).lower(
            state, wave, pitch, jnp.float32(1.0)
        ).compile()
        cost = single.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bts = float(cost.get("bytes accessed", 0.0))
        t_step = results["full_step"]
        print(f"\nper-step FLOPs {flops/1e9:.1f} G, HBM bytes "
              f"{bts/1e9:.2f} GB", flush=True)
        print(f"achieved {flops/t_step/1e12:.2f} TFLOP/s "
              f"({100*flops/t_step/197e12:.1f}% of bf16 peak), "
              f"{bts/t_step/1e9:.0f} GB/s "
              f"({100*bts/t_step/819e9:.1f}% of HBM peak)", flush=True)
        t_light = max(flops / 197e12, bts / 819e9)
        print(f"roofline-limited step time {t_light*1e3:.1f} ms -> at "
              f"{100*t_light/t_step:.0f}% of speed-of-light", flush=True)
    except Exception as e:
        print(f"cost analysis unavailable: {e}", flush=True)

    # -- profiler trace attempt --
    try:
        with jax.profiler.trace(args.trace_dir):
            s, mets = superstep(s, waves_k, pitch_k, alphas)
            float(mets["d_loss"])
        print(f"trace written to {args.trace_dir}", flush=True)
        # Per-op table inline so the window log carries the roofline
        # rebuild inputs without a second command.
        try:
            import trace_summary

            print(flush=True)
            trace_summary.summarize(args.trace_dir, top=30)
        except Exception as e:
            print(f"(trace summary unavailable: {e}; run "
                  f"scripts/trace_summary.py {args.trace_dir})", flush=True)
    except Exception as e:  # tunneled backends may not support profiling
        print(f"profiler trace unavailable: {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    main()
