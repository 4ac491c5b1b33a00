"""Network building blocks (SURVEY.md §2.3, N1–N6).

Progressive-GAN layer ops, written TPU-first:

- Equalized learning rate (N1): weights are stored ~N(0,1) and multiplied
  at call time by the He constant ``gain / sqrt(fan_in)``; with Adam this
  equalizes the effective per-layer learning rate (the PGGAN trick).
- Pixel norm (N2), minibatch stddev (N3), nearest-neighbor up / average
  down sampling (N4) as pure functions.
- NHWC layout throughout; convolutions lower to XLA convolution HLOs that
  map onto the MXU. Parameters are always float32; ``compute_dtype``
  selects the activation/matmul width (bfloat16 halves HBM traffic — the
  measured bottleneck — while pixel-norm/minibatch-stddev reductions stay
  float32).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def he_scale(fan_in: int, gain: float) -> float:
    return gain / np.sqrt(float(fan_in))


class EqualizedDense(nn.Module):
    """Dense layer with runtime He scaling (N1).

    ``compute_dtype`` selects the activation/matmul dtype. Params are
    always stored float32; on the bfloat16 fast path inputs, outputs and
    stored activations are half-width (the pipeline is HBM-bandwidth
    bound, so this is where the speed lives), while reductions elsewhere
    (pixel_norm, minibatch_stddev, losses) still run float32.
    """

    features: int
    gain: float = np.sqrt(2.0)
    use_bias: bool = True
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.normal(1.0), (fan_in, self.features)
        )
        cdt = jnp.dtype(self.compute_dtype)
        y = jax.lax.dot_general(
            x.astype(cdt),
            (kernel * he_scale(fan_in, self.gain)).astype(cdt),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=cdt,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(cdt)
        return y


class EqualizedConv(nn.Module):
    """3x3 (or 1x1) conv with runtime He scaling (N1). NHWC, SAME padding.

    Same mixed-precision contract as :class:`EqualizedDense`.

    Lowerings (all equality-tested against the ``lax.conv_general_dilated``
    literal form):

    - 1x1 convs with a tiny fan-in (the 2-channel fromRGB heads) always
      lower to a broadcast multiply-add — a fused VPU elementwise pass.
      The conv HLO puts the 2-deep contraction on the MXU at 2/128 lane
      fill, and the profile showed it costing 5.3 ms/step at stage 6.
    - ``conv_kernel="pallas"`` lowers eligible 3x3 convs (128/256-channel
      stages) through the VMEM row-band Pallas kernel
      (kernels/pallas_conv.py). Measured SLOWER than the conv HLO in
      isolation (DESIGN.md §2c) — kept as an exercised alternative
      lowering, default stays "xla".
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    gain: float = np.sqrt(2.0)
    use_bias: bool = True
    compute_dtype: str = "float32"
    conv_kernel: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        fan_in = kh * kw * x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.normal(1.0),
            (kh, kw, x.shape[-1], self.features),
        )
        cdt = jnp.dtype(self.compute_dtype)
        scaled = (kernel * he_scale(fan_in, self.gain)).astype(cdt)
        xc = x.astype(cdt)
        if (kh, kw) == (1, 1) and x.shape[-1] <= 4:
            y = sum(
                xc[..., i:i + 1] * scaled[0, 0, i]
                for i in range(x.shape[-1])
            )
        elif self.conv_kernel == "pallas" and _pallas_conv_ok(
            x.shape, (kh, kw, x.shape[-1], self.features)
        ):
            from gansynth_tpu.kernels.pallas_conv import conv3x3_same

            y = conv3x3_same(xc, scaled)
        else:
            y = jax.lax.conv_general_dilated(
                xc,
                scaled,
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=cdt,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(cdt)
        return y


def _pallas_conv_ok(x_shape, kernel_shape) -> bool:
    from gansynth_tpu.kernels.pallas_conv import conv3x3_eligible

    return conv3x3_eligible(x_shape, kernel_shape)


def _smear_kernel_2x(kernel: jax.Array) -> jax.Array:
    """3x3 -> 4x4 kernel: full 2-D convolution with ones(2,2).

    ``K'[a,b] = sum_{da,db in {0,1}} K[a-da, b-db]`` — the kernel algebra
    that turns (nearest-upsample2 then 3x3 SAME conv) into one stride-2
    transposed conv, and (3x3 SAME conv then 2x2 avgpool) into one stride-2
    conv (divided by 4). The fused forms never materialize the
    double-resolution activation tensor, saving its full HBM round trip.
    """
    p = jnp.pad
    return (
        p(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        + p(kernel, ((1, 0), (0, 1), (0, 0), (0, 0)))
        + p(kernel, ((0, 1), (1, 0), (0, 0), (0, 0)))
        + p(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    )


class EqualizedUpConv(nn.Module):
    """Fused nearest-upsample(x2) + 3x3 eq-LR conv.

    Exactly equivalent (same sums) to ``EqualizedConv(3,3)`` applied to
    ``upsample_nearest(x, 2)`` — parameter shapes identical, so the two
    are checkpoint-interchangeable. Implemented as one input-dilated conv
    with the smeared 4x4 kernel.
    """

    features: int
    gain: float = np.sqrt(2.0)
    use_bias: bool = True
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = 3 * 3 * x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.normal(1.0),
            (3, 3, x.shape[-1], self.features),
        )
        cdt = jnp.dtype(self.compute_dtype)
        k4 = _smear_kernel_2x(kernel * he_scale(fan_in, self.gain)).astype(cdt)
        y = jax.lax.conv_general_dilated(
            x.astype(cdt),
            k4,
            window_strides=(1, 1),
            padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=cdt,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(cdt)
        return y


def pixel_norm(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """N2: x / sqrt(mean(x^2, channel axis) + eps); channel axis is last.

    The reduction runs in float32 regardless of the activation dtype
    (bf16-safe); the output keeps the input dtype so the stored activation
    buffers stay half-width on the bf16 fast path.
    """
    x32 = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    return (x32 * scale).astype(x.dtype)


def _mbstd_stat(x: jax.Array, group_size: int, eps: float) -> jax.Array:
    """The stddev feature map for one batch chunk: [B, H, W, C] ->
    [B, H, W, 1] (the channel appended by :func:`minibatch_stddev`)."""
    b, h, w, c = x.shape
    g = group_size if (group_size and b % group_size == 0) else b
    y = x.astype(jnp.float32).reshape(g, b // g, h, w, c)
    var = jnp.mean(jnp.square(y - jnp.mean(y, axis=0, keepdims=True)), axis=0)
    stat = jnp.mean(jnp.sqrt(var + eps), axis=(1, 2, 3), keepdims=True)  # [b/g,1,1,1]
    # Sample g_idx*(b/g) + m carries stat[m]; tiling repeats the stats in
    # exactly that order.
    return jnp.tile(stat, (g, h, w, 1))  # [B, H, W, 1]


def minibatch_stddev(
    x: jax.Array,
    group_size: int = 4,
    eps: float = 1e-8,
    num_replicas: int = 1,
) -> jax.Array:
    """N3: append one feature map of batch-group stddev statistics.

    Splits the batch into groups of ``group_size`` (whole batch if it does
    not divide), computes the per-group stddev of every feature, averages
    it into one scalar per group, and tiles it as an extra channel.
    [B, H, W, C] -> [B, H, W, C+1].

    ``num_replicas > 1`` selects PER-REPLICA semantics (SURVEY.md §2.7's
    reference-faithful option: the single-device reference computes stats
    over its local batch only): the batch is split into ``num_replicas``
    contiguous chunks — the per-device shards under the loop's
    batch-sharded layout — and groups never cross chunk boundaries. Under
    GSPMD this reduction is shard-local, so it also removes the
    cross-replica collective that global-batch stats need.
    """
    b = x.shape[0]
    if num_replicas > b:
        # Sub-replica batches only occur off the training path (parameter
        # init traces with batch 1); fall back to whole-batch stats there.
        num_replicas = 1
    if num_replicas <= 1:
        stat = _mbstd_stat(x, group_size, eps)
    else:
        if b % num_replicas:
            raise ValueError(
                f"batch {b} must divide num_replicas {num_replicas}"
            )
        chunks = x.reshape((num_replicas, b // num_replicas) + x.shape[1:])
        stat = jax.vmap(lambda c: _mbstd_stat(c, group_size, eps))(chunks)
        stat = stat.reshape((b,) + stat.shape[2:])
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
    """Fade-in interpolation: (1-t)*a + t*b, t traced (no recompile on t).

    Keeps ``b``'s dtype (a traced f32 scalar must not silently promote
    bf16 activation buffers back to full width).
    """
    return (a + (b - a) * t).astype(b.dtype)
