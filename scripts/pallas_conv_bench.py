"""Microbenchmark: Pallas VMEM-im2col conv vs XLA conv HLO on TPU.

Times forward and forward+backward at the training ladder's wide-stage
shapes. Timing discipline per CLAUDE.md: iterations amortized inside one
lax.scan'd device program, synchronized through a fetched scalar checksum
(block_until_ready does not block on the tunneled backend). The scan
carry perturbs the input so the body is not loop-invariant (the r2
profiling bug).
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from gansynth_tpu.kernels.pallas_conv import conv3x3_same
from gansynth_tpu.utils.platform import enable_compile_cache

SHAPES = [
    # (B, H, W, C_in, C_out) — trunk convs, ordered by round-4 priority:
    # the C=64 stage-6 shape (pixel-pairing eligible; VERDICT r3 item 5)
    # first so a short TPU window still answers the open question, then
    # the stage-5/4 shapes the row-band kernel was measured on in r3.
    (8, 128, 1024, 64, 64),
    (8, 64, 512, 128, 128),
    (8, 32, 256, 256, 256),
]


def xla_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def timed(name, fn, x, k, iters, repeats):
    @jax.jit
    def many(x, k):
        def body(c, _):
            y = fn(x + c.astype(x.dtype), k)
            # Bounded carry: the grad programs amplify an input shift by
            # ~N_pixels x N_kernel, so an unbounded checksum feedback
            # loop gains ~x38/iter and NaNs by iter ~50. tanh keeps the
            # data dependence (no loop-invariant hoisting) but caps the
            # perturbation at 1e-6.
            s = jnp.sum(y[..., 0, 0].astype(jnp.float32))
            return jnp.tanh(s) * 1e-6, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=iters
        )
        return acc

    c0 = float(many(x, k))  # compile + warm
    print(f"  [{name}] warm checksum {c0:.3e}", flush=True)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = float(many(x, k))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(c), (name, c)
    return float(np.median(times)) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()
    enable_compile_cache()
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    for b, h, w, cin, cout in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), dt)
        k = jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)) / np.sqrt(9 * cin), dt
        )
        flops = 2 * b * h * w * 9 * cin * cout

        def as_grad(f):
            def g(x, k):
                dx, dk = jax.grad(
                    lambda xx, kk: jnp.sum(f(xx, kk).astype(jnp.float32)),
                    argnums=(0, 1),
                )(x, k)
                return dx + jnp.sum(dk).astype(dx.dtype)

            return g

        row = {"shape": (b, h, w, cin, cout)}
        print(f"shape {(b, h, w, cin, cout)}", flush=True)
        for name, f in (("xla", xla_conv), ("pallas", conv3x3_same)):
            try:
                t_f = timed(f"{name}-fwd", f, x, k, args.iters, args.repeats)
                t_g = timed(f"{name}-grad", as_grad(f), x, k,
                            args.iters, args.repeats)
            except Exception as e:  # keep benching the other shapes
                row[f"{name}_error"] = str(e).split("\n")[0][:200]
                continue
            row[f"{name}_fwd_us"] = round(t_f * 1e6, 1)
            row[f"{name}_fwd_tflops"] = round(flops / t_f / 1e12, 1)
            row[f"{name}_grad_us"] = round(t_g * 1e6, 1)
        print(row, flush=True)


if __name__ == "__main__":
    main()
