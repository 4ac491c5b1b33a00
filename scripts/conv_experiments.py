"""Empirical shootout for the stage-5/6 conv bottleneck (DESIGN.md §2c).

The per-op trace shows the top-stage 3x3 convs running at ~25-40% MXU
(the emitter contracts 8-32 input channels per pass) while the
well-shaped stage-4 convs hit ~80%+. Theory is ambiguous about the fix,
so measure candidate formulations of the SAME function directly:

  base   — lax.conv_general_dilated NHWC (production lowering)
  nchw   — same conv, NCHW dimension numbers
  i2c    — im2col patches + one MXU matmul
  s2d    — space-to-depth packed conv (dense 4x FLOPs, full lanes)
  pool_rw / pool_rs — avgpool via reduce_window vs reshape-mean

Each candidate is equality-checked against base (atol 1e-2 bf16) before
timing; timing is scan-amortized with carry perturbation and
fetched-scalar sync (CLAUDE.md). Run only when no other TPU job is
active (single-tenant tunnel).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from gansynth_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp


def timed(fn, x, iters=32, repeats=3):
    @jax.jit
    def many(x):
        def body(c, _):
            out = fn(x + (c * 1e-30).astype(x.dtype))
            red = jnp.sum(out.astype(jnp.float32).ravel()[::1024])
            return red, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc

    float(many(x))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(many(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def conv_nhwc(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def conv_nchw(x, k):
    xt = jnp.transpose(x, (0, 3, 1, 2))
    kt = jnp.transpose(k, (3, 2, 0, 1))
    y = jax.lax.conv_general_dilated(
        xt, kt, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=x.dtype)
    return jnp.transpose(y, (0, 2, 3, 1))


def conv_im2col(x, k):
    b, h, w, c = x.shape
    co = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)          # [B,H,W,9C]
    y = patches.reshape(b * h * w, 9 * c) @ k.reshape(9 * c, co)
    return y.reshape(b, h, w, co)


def space_to_depth(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(y):
    b, h2, w2, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h2, w2, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h2 * 2, w2 * 2, c)


def packed_kernel(k):
    """3x3 [Ci,Co] kernel -> 3x3 packed [4Ci,4Co] kernel computing the
    identical stride-1 conv in space-to-depth coordinates."""
    ci, co = k.shape[2], k.shape[3]
    kp = np.zeros((3, 3, 4 * ci, 4 * co), k.dtype)
    # output subpixel (sy,sx) at packed (i,j) = original (2i+sy, 2j+sx);
    # tap (dy,dx) reads original (2i+sy+dy, 2j+sx+dx) = packed
    # (i + py, j + px) subpixel (ry, rx) with sy+dy = 2*py' + ry ...
    for sy in range(2):
        for sx in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    oy, ox = sy + dy, sx + dx
                    py, ry = oy // 2, oy % 2
                    px, rx = ox // 2, ox % 2
                    kp[py + 1, px + 1,
                       (2 * ry + rx) * ci:(2 * ry + rx + 1) * ci,
                       (2 * sy + sx) * co:(2 * sy + sx + 1) * co] = \
                        np.asarray(k[dy + 1, dx + 1])
    return jnp.asarray(kp)


def main():
    rng = np.random.default_rng(0)
    results = {}
    for (cin, cout, h, w, tag) in [(64, 64, 128, 1024, "s6_conv0"),
                                   (64, 128, 128, 1024, "s6_conv1"),
                                   (128, 128, 64, 512, "s5_conv0"),
                                   (256, 256, 32, 256, "s4_conv0")]:
        x = jnp.asarray(rng.standard_normal((8, h, w, cin)), jnp.bfloat16)
        k = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout)),
                        jnp.bfloat16)
        base = conv_nhwc(x, k)
        flops = 2 * 8 * h * w * 9 * cin * cout

        cands = {"base": lambda xx: conv_nhwc(xx, k),
                 "nchw": lambda xx: conv_nchw(xx, k),
                 "i2c": lambda xx: conv_im2col(xx, k)}
        kp = packed_kernel(np.asarray(k, np.float32)).astype(jnp.bfloat16)
        cands["s2d"] = lambda xx: depth_to_space(
            conv_nhwc(space_to_depth(xx), kp))

        for name, fn in cands.items():
            if name != "base":
                err = float(jnp.max(jnp.abs(
                    fn(x).astype(jnp.float32) - base.astype(jnp.float32))))
                scale = float(jnp.max(jnp.abs(base.astype(jnp.float32))))
                assert err < 0.05 * scale, (tag, name, err, scale)
            t = timed(fn, x)
            eff = flops / t / 197e12 * (4 if name == "s2d" else 1)
            print(f"{tag:9s} {name:5s} {t*1e3:7.3f} ms  "
                  f"useful-MXU {100*flops/t/197e12:5.1f}%  "
                  f"(issued {100*eff:5.1f}%)", flush=True)
            results[(tag, name)] = t

    # avgpool variants on the stage-6 activation
    x = jnp.asarray(rng.standard_normal((8, 128, 1024, 64)), jnp.bfloat16)

    def pool_rw(xx):
        s = jax.lax.reduce_window(xx, jnp.bfloat16(0), jax.lax.add,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return s * jnp.bfloat16(0.25)

    def pool_rs(xx):
        b, h, w, c = xx.shape
        y = xx.reshape(b, h // 2, 2, w // 2, 2, c).astype(jnp.float32)
        return jnp.mean(y, axis=(2, 4)).astype(xx.dtype)

    err = float(jnp.max(jnp.abs(pool_rw(x).astype(jnp.float32)
                                - pool_rs(x).astype(jnp.float32))))
    print(f"pool equal to {err:.3e}")
    for name, fn in [("pool_rw", pool_rw), ("pool_rs", pool_rs)]:
        print(f"{name}: {timed(fn, x)*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
