"""Network building blocks (SURVEY.md §2.3, N1–N6).

Progressive-GAN layer ops, written TPU-first:

- Equalized learning rate (N1): weights are stored ~N(0,1) and multiplied
  at call time by the He constant ``gain / sqrt(fan_in)``; with Adam this
  equalizes the effective per-layer learning rate (the PGGAN trick).
- Pixel norm (N2), minibatch stddev (N3), nearest-neighbor up / average
  down sampling (N4) as pure functions.
- NHWC layout throughout; convolutions lower to XLA convolution HLOs that
  map onto the MXU. All math f32 by default (the model is small enough
  that bf16 is a bench-time option, not a requirement).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def he_scale(fan_in: int, gain: float) -> float:
    return gain / np.sqrt(float(fan_in))


class EqualizedDense(nn.Module):
    """Dense layer with runtime He scaling (N1)."""

    features: int
    gain: float = np.sqrt(2.0)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.normal(1.0), (fan_in, self.features)
        )
        y = x @ (kernel * he_scale(fan_in, self.gain))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class EqualizedConv(nn.Module):
    """3x3 (or 1x1) conv with runtime He scaling (N1). NHWC, SAME padding."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    gain: float = np.sqrt(2.0)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        fan_in = kh * kw * x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.normal(1.0),
            (kh, kw, x.shape[-1], self.features),
        )
        y = jax.lax.conv_general_dilated(
            x,
            kernel * he_scale(fan_in, self.gain),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


def pixel_norm(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """N2: x / sqrt(mean(x^2, channel axis) + eps); channel axis is last."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)


def minibatch_stddev(
    x: jax.Array, group_size: int = 4, eps: float = 1e-8
) -> jax.Array:
    """N3: append one feature map of batch-group stddev statistics.

    Splits the batch into groups of ``group_size`` (whole batch if it does
    not divide), computes the per-group stddev of every feature, averages
    it into one scalar per group, and tiles it as an extra channel.
    [B, H, W, C] -> [B, H, W, C+1].
    """
    b, h, w, c = x.shape
    g = group_size if (group_size and b % group_size == 0) else b
    y = x.reshape(g, b // g, h, w, c)
    var = jnp.mean(jnp.square(y - jnp.mean(y, axis=0, keepdims=True)), axis=0)
    stat = jnp.mean(jnp.sqrt(var + eps), axis=(1, 2, 3), keepdims=True)  # [b/g,1,1,1]
    # Sample g_idx*(b/g) + m carries stat[m]; tiling repeats the stats in
    # exactly that order.
    stat = jnp.tile(stat, (g, h, w, 1))  # [B, H, W, 1]
    return jnp.concatenate([x, stat.astype(x.dtype)], axis=-1)


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """N4 (G): x2 nearest-neighbor upsample, NHWC.

    Per-axis ``repeat`` (single-axis reshapes) so GSPMD sharding
    propagation stays unambiguous under a sharded batch axis.
    """
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


def downsample_avg(x: jax.Array, factor: int = 2) -> jax.Array:
    """N4 (D): x2 average-pool downsample, NHWC.

    ``reduce_window`` is the canonical XLA pooling HLO — shard-friendly
    and MXU/VPU-mapped on TPU (unlike a multi-axis-splitting reshape,
    which GSPMD cannot infer shardings through).
    """
    window = (1, factor, factor, 1)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, window, "VALID")
    return summed / float(factor * factor)


def leaky_relu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    """N6: LeakyReLU(0.2)."""
    return jax.nn.leaky_relu(x, negative_slope=slope)


def lerp(a: jax.Array, b: jax.Array, t) -> jax.Array:
    """Fade-in interpolation: (1-t)*a + t*b, t traced (no recompile on t)."""
    return a + (b - a) * t
