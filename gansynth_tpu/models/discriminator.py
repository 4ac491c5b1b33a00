"""Progressive discriminator / critic with auxiliary pitch head
(SURVEY.md §2.4, DS1–DS2).

Mirror of the generator: fromRGB at the input resolution, per-stage
[two 3x3 eq-LR convs -> avgpool x2] blocks down to the (2 x 16) base grid,
minibatch-stddev, a final conv + dense trunk, then two heads:

- a scalar WGAN critic score, and
- 61-way pitch-classification logits (AC-GAN style auxiliary head).

Same stage-independent parameter-tree design as the generator: every
stage's params exist from init; ``stage`` is static, ``alpha`` traced
(fade-in mixes ``block_s(fromRGB_s(img))`` with
``fromRGB_{s-1}(avgpool2(img))``, SURVEY.md §3.4).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gansynth_tpu.models.layers import (
    EqualizedConv,
    EqualizedDense,
    downsample_avg,
    he_scale,
    leaky_relu,
    lerp,
    minibatch_stddev,
)
from gansynth_tpu.utils.config import ModelConfig


class _EqConvParams(nn.Module):
    """Param-tree twin of :class:`EqualizedConv`: declares the identical
    kernel/bias leaves (names, shapes, initializers) and returns them
    with the eq-LR He scale folded, for lowerings that consume raw
    weights (the fused block kernel). A checkpoint trained either way
    restores into the other unchanged."""

    features: int

    @nn.compact
    def __call__(self, c_in: int):
        kernel = self.param(
            "kernel", nn.initializers.normal(1.0),
            (3, 3, c_in, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel * he_scale(9 * c_in, float(np.sqrt(2.0))), bias


class DiscriminatorBlock(nn.Module):
    """One trunk stage: two 3x3 eq-LR convs (widening toward the base),
    LeakyReLU, then avgpool x2.

    ``dblock_kernel='pallas'`` lowers the WHOLE chain through the fused
    VMEM-resident Pallas program (kernels/pallas_dblock.py) on eligible
    geometry (the stage-6 64-channel block — the step's top HBM sink);
    ineligible stages stay on the XLA path below. Same param tree either
    way (``_EqConvParams``)."""

    features: int       # width of conv0 (this stage's width)
    out_features: int   # width of conv1 (next-lower stage's width)
    lrelu_slope: float = 0.2
    compute_dtype: str = "float32"
    conv_kernel: str = "xla"
    dblock_kernel: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.dblock_kernel == "pallas" and _pallas_dblock_ok(
            x.shape, self.features, self.out_features
        ):
            from gansynth_tpu.kernels.pallas_dblock import fused_dblock

            k0, b0 = _EqConvParams(self.features, name="conv0")(x.shape[-1])
            k1, b1 = _EqConvParams(self.out_features,
                                   name="conv1")(self.features)
            cdt = jnp.dtype(self.compute_dtype)
            return fused_dblock(
                x.astype(cdt), k0, b0, k1, b1, self.lrelu_slope, False
            )
        x = leaky_relu(
            EqualizedConv(self.features, compute_dtype=self.compute_dtype,
                          conv_kernel=self.conv_kernel, name="conv0")(x),
            self.lrelu_slope,
        )
        # Not fused with the pool: the reference family applies LeakyReLU
        # BEFORE the avgpool, and pool(lrelu(x)) != lrelu(pool(x)). XLA
        # fuses the lrelu+avgpool pair into one kernel anyway.
        x = leaky_relu(
            EqualizedConv(self.out_features, compute_dtype=self.compute_dtype,
                          conv_kernel=self.conv_kernel, name="conv1")(x),
            self.lrelu_slope,
        )
        return downsample_avg(x, 2)


def _pallas_dblock_ok(x_shape, c_out0: int, c_out1: int) -> bool:
    from gansynth_tpu.kernels.pallas_dblock import dblock_eligible

    return dblock_eligible(x_shape, c_out0, c_out1)


class Discriminator(nn.Module):
    """image at ``stage``'s resolution -> (critic score [B], pitch logits [B, 61])."""

    config: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(
        self, image: jax.Array, stage: int, alpha: jax.Array = 1.0
    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        if not 0 <= stage < cfg.num_stages:
            raise ValueError(f"stage must be in [0, {cfg.num_stages}), got {stage}")
        expected = cfg.stage_resolution(stage)
        if image.shape[1:3] != expected:
            raise ValueError(
                f"stage {stage} expects {expected} images, got {image.shape[1:3]}"
            )

        # fromRGB heads (N5). Head i maps the 2-channel image to ch(i).
        from_rgb = [
            EqualizedConv(cfg.stage_channels(i), kernel_size=(1, 1),
                          compute_dtype=cfg.compute_dtype, name=f"from_rgb_{i}")
            for i in range(cfg.num_stages)
        ]

        x = leaky_relu(from_rgb[stage](image), cfg.leaky_relu_slope)

        # Trunk blocks from `stage` down to 1 (block i halves resolution i -> i-1).
        block_cls = (
            nn.remat(DiscriminatorBlock) if cfg.remat else DiscriminatorBlock
        )
        for i in range(cfg.num_stages - 1, 0, -1):
            block = block_cls(
                cfg.stage_channels(i),
                cfg.stage_channels(i - 1),
                lrelu_slope=cfg.leaky_relu_slope,
                compute_dtype=cfg.compute_dtype,
                conv_kernel=cfg.conv_kernel,
                dblock_kernel=cfg.dblock_kernel,
                name=f"block_{i}",
            )
            if i <= stage:
                x = block(x)
                if i == stage and stage > 0:
                    # Fade-in: blend with the previous stage's input path.
                    skip = leaky_relu(
                        from_rgb[stage - 1](downsample_avg(image, 2)),
                        cfg.leaky_relu_slope,
                    )
                    x = lerp(skip, x, alpha)
            else:
                _ = block(jnp.zeros((1, 2, 2, cfg.stage_channels(i)), x.dtype))

        # Instantiate unused fromRGB heads (stage-independent param tree).
        for i in range(cfg.num_stages):
            if i not in (stage, stage - 1 if stage > 0 else stage):
                _ = from_rgb[i](jnp.zeros((1, 1, 1, cfg.num_channels), x.dtype))

        # Base block at (2 x 16): minibatch stddev, conv, flatten, dense.
        x = minibatch_stddev(x, cfg.mbstd_group_size, cfg.mbstd_eps,
                             cfg.mbstd_replicas)
        x = leaky_relu(
            EqualizedConv(cfg.stage_channels(0), compute_dtype=cfg.compute_dtype,
                          name="final_conv")(x),
            cfg.leaky_relu_slope,
        )
        x = x.reshape(x.shape[0], -1)
        x = leaky_relu(
            EqualizedDense(cfg.stage_channels(0), compute_dtype=cfg.compute_dtype,
                           name="final_dense")(x),
            cfg.leaky_relu_slope,
        )
        critic = EqualizedDense(1, gain=1.0, name="critic_head")(x)[:, 0]
        pitch_logits = EqualizedDense(cfg.num_pitches, gain=1.0, name="pitch_head")(x)
        return critic, pitch_logits
