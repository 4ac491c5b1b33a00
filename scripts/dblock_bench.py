"""Microbenchmark: fused D-block Pallas kernel vs the XLA three-kernel
chain on TPU (VERDICT-r4 item 2's accept-or-reject measurement).

Times the stage-6 discriminator block (conv 64->64 -> lrelu ->
conv 64->128 -> lrelu -> avgpool2 at 128x1024, batch 8) three ways:

- forward only — where the fused kernel's ~3.7x HBM-traffic cut lives
  (inter-layer activations never leave VMEM);
- forward+backward — the VJP remats through literal XLA convs, so this
  shows the net effect inside a gradient pass;
- a full WGAN-GP superstep A/B (dblock_kernel 'xla' vs 'pallas') — the
  number that decides the config default.

Timing discipline per CLAUDE.md: iterations amortized inside one
lax.scan'd device program, synchronized through a fetched scalar
checksum, bounded tanh carry so the body is not loop-invariant.
"""

import argparse
import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from gansynth_tpu.kernels.pallas_dblock import _literal_chain, fused_dblock
from gansynth_tpu.utils.platform import enable_compile_cache

B, H, W, C0, C1 = 8, 128, 1024, 64, 128


def timed(name, fn, args_tuple, iters, repeats):
    @jax.jit
    def many(*a):
        def body(c, _):
            y = fn(a[0] + c.astype(a[0].dtype), *a[1:])
            s = jnp.sum(y[..., 0, 0].astype(jnp.float32))
            return jnp.tanh(s) * 1e-6, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=iters
        )
        return acc

    c0 = float(many(*args_tuple))  # compile + warm
    print(f"  [{name}] warm checksum {c0:.3e}", flush=True)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = float(many(*args_tuple))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(c), (name, c)
    return float(np.median(times)) / iters


def bench_block(dtype, iters, repeats):
    rng = np.random.default_rng(0)
    dt = jnp.dtype(dtype)
    x = jnp.asarray(rng.standard_normal((B, H, W, C0)), dt)
    k0 = jnp.asarray(rng.standard_normal((3, 3, C0, C0)) / 24, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((C0,)) * 0.1, jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, C0, C1)) / 24, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((C1,)) * 0.1, jnp.float32)
    args5 = (x, k0, b0, k1, b1)

    def xla_block(x, k0, b0, k1, b1):
        return _literal_chain(x, k0, b0, k1, b1, slope=0.2)

    def pallas_block(x, k0, b0, k1, b1):
        return fused_dblock(x, k0, b0, k1, b1, 0.2, False)

    def as_grad(f):
        def g(x, k0, b0, k1, b1):
            dx, dk0 = jax.grad(
                lambda xx, kk: jnp.sum(
                    f(xx, kk, b0, k1, b1).astype(jnp.float32)
                ),
                argnums=(0, 1),
            )(x, k0)
            return dx + jnp.sum(dk0).astype(dx.dtype)

        return g

    row = {"shape": (B, H, W, C0, C1), "dtype": dtype}
    for name, f in (("xla", xla_block), ("pallas", pallas_block)):
        try:
            t_f = timed(f"{name}-fwd", f, args5, iters, repeats)
            t_g = timed(f"{name}-grad", as_grad(f), args5, iters, repeats)
        except Exception as e:
            row[f"{name}_error"] = str(e).split("\n")[0][:200]
            continue
        row[f"{name}_fwd_us"] = round(t_f * 1e6, 1)
        row[f"{name}_grad_us"] = round(t_g * 1e6, 1)
    # HBM floor for the forward: read x + write pooled out, bf16.
    traffic = (B * H * W * C0 + B * (H // 2) * (W // 2) * C1) * dt.itemsize
    row["fwd_hbm_floor_us"] = round(traffic / 819e9 * 1e6, 1)
    print(row, flush=True)
    return row


def bench_superstep(dblock_kernel, iters, repeats):
    """Full stage-6 WGAN-GP superstep with the given D-block lowering."""
    from gansynth_tpu.train import create_train_state, make_superstep
    from gansynth_tpu.utils.config import Config, ModelConfig, TrainConfig

    cfg = Config(
        model=ModelConfig(compute_dtype="bfloat16",
                          dblock_kernel=dblock_kernel),
        train=TrainConfig(batch_size=8),
    )
    stage = cfg.model.num_stages - 1
    state = create_train_state(cfg, seed=0)
    step = jax.jit(make_superstep(cfg, stage))
    rng = np.random.default_rng(0)
    k = 4
    waves = jnp.asarray(
        rng.standard_normal((k, 8, cfg.audio.audio_length)), jnp.float32
    )
    pitches = jnp.asarray(rng.integers(24, 85, (k, 8)), jnp.int32)
    alphas = jnp.ones((k,), jnp.float32)

    def run():
        s2, m = step(state, waves, pitches, alphas)
        return float(m["d_loss"])

    d0 = run()  # compile + warm
    print(f"  [superstep-{dblock_kernel}] warm d_loss {d0:.3f}", flush=True)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        d = run()
        times.append(time.perf_counter() - t0)
        assert np.isfinite(d)
    per_step = float(np.median(times)) / k
    print({"superstep": dblock_kernel, "ms_per_step": round(per_step * 1e3, 2)},
          flush=True)
    return per_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--skip-superstep", action="store_true")
    args = p.parse_args()
    enable_compile_cache()
    bench_block(args.dtype, args.iters, args.repeats)
    if not args.skip_superstep:
        # Each arm isolated: a Mosaic compile failure on the pallas arm is
        # itself a valid "reject" datum and must not take the xla arm (or
        # the window leg) down with it.
        per = {}
        for kern in ("xla", "pallas"):
            try:
                per[kern] = bench_superstep(kern, args.iters, args.repeats)
            except Exception as e:
                print({"superstep": kern,
                       "error": str(e).split("\n")[0][:200]}, flush=True)
        if len(per) == 2:
            print({"step_speedup_pallas_vs_xla":
                   round(per["xla"] / per["pallas"], 3)}, flush=True)


if __name__ == "__main__":
    main()
