"""Progressive pitch-conditioned generator (SURVEY.md §2.4, G1–G3).

TPU-first structural choice: the FULL parameter tree (all 7 stages' blocks
and toRGB heads) is created at init, and the forward pass uses only the
blocks up to the static ``stage`` argument. Stage transitions therefore
need no parameter surgery — they are a Python-int change that triggers one
fresh XLA compile per stage (7 total), while checkpoint/EMA/optimizer tree
shapes stay constant for the whole run. Unused stages receive zero
gradients. The fade-in coefficient ``alpha`` is a traced scalar, so the
entire fade needs no recompilation (SURVEY.md §7 step 4).

Stage ladder: (2x16) -> (4x32) -> ... -> (128x1024); output is the
2-channel (scaled log-mel-magnitude, mel-IF) spectrogram image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gansynth_tpu.models.layers import (
    EqualizedConv,
    EqualizedDense,
    EqualizedUpConv,
    leaky_relu,
    lerp,
    pixel_norm,
    upsample_nearest,
)
from gansynth_tpu.utils.config import ModelConfig


class GeneratorBlock(nn.Module):
    """One trunk stage: [upsample x2 ->] two 3x3 eq-LR convs, PN + LeakyReLU."""

    features: int
    upsample: bool = True
    lrelu_slope: float = 0.2
    pn_eps: float = 1e-8
    compute_dtype: str = "float32"
    conv_kernel: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.upsample:
            # Fused upsample+conv: same math as upsample_nearest -> conv,
            # same "conv0" param shapes, one HBM round trip fewer. (Stays
            # on the XLA lowering — the smeared 4x4 input-dilated conv is
            # outside the Pallas kernel's 3x3 stride-1 shape contract.)
            x = EqualizedUpConv(self.features, compute_dtype=self.compute_dtype,
                                name="conv0")(x)
        else:
            x = EqualizedConv(self.features, compute_dtype=self.compute_dtype,
                              conv_kernel=self.conv_kernel, name="conv0")(x)
        x = pixel_norm(leaky_relu(x, self.lrelu_slope), self.pn_eps)
        x = EqualizedConv(self.features, compute_dtype=self.compute_dtype,
                          conv_kernel=self.conv_kernel, name="conv1")(x)
        x = pixel_norm(leaky_relu(x, self.lrelu_slope), self.pn_eps)
        return x


class Generator(nn.Module):
    """latents + one-hot pitch -> spectrogram image at ``stage``'s resolution.

    ``stage`` is static (selects the Python-level block loop); ``alpha`` is
    traced (fade-in lerp between the previous stage's upsampled toRGB output
    and the new stage's, SURVEY.md §3.4).
    """

    config: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(
        self, z: jax.Array, labels: jax.Array, stage: int, alpha: jax.Array = 1.0
    ) -> jax.Array:
        cfg = self.config
        if not 0 <= stage < cfg.num_stages:
            raise ValueError(f"stage must be in [0, {cfg.num_stages}), got {stage}")

        # G1: pitch-conditioned latent head. Normalize the latent vector
        # (PGGAN normalizes latents before the first layer), concat the
        # one-hot pitch, and project to the base (2 x 16) grid.
        x = jnp.concatenate([z, labels.astype(z.dtype)], axis=-1)
        x = pixel_norm(x, cfg.pixelnorm_eps)
        ch0 = cfg.stage_channels(0)
        x = EqualizedDense(
            cfg.base_height * cfg.base_width * ch0,
            compute_dtype=cfg.compute_dtype,
            name="latent_dense",
        )(x)
        x = x.reshape(x.shape[0], cfg.base_height, cfg.base_width, ch0)
        x = pixel_norm(leaky_relu(x, cfg.leaky_relu_slope), cfg.pixelnorm_eps)

        # Trunk: build every stage's params; run blocks 0..stage.
        block_cls = nn.remat(GeneratorBlock) if cfg.remat else GeneratorBlock
        feats = []
        for i in range(cfg.num_stages):
            block = block_cls(
                cfg.stage_channels(i),
                upsample=(i > 0),
                lrelu_slope=cfg.leaky_relu_slope,
                pn_eps=cfg.pixelnorm_eps,
                compute_dtype=cfg.compute_dtype,
                conv_kernel=cfg.conv_kernel,
                name=f"block_{i}",
            )
            if i <= stage:
                x = block(x)
                feats.append(x)
            else:
                # Instantiate params without contributing to the output so
                # the parameter tree is stage-independent. The dummy input
                # must have the width the block would really see (the
                # previous stage's channels) or kernel shapes would vary
                # with `stage`. XLA dead-code-eliminates these.
                _ = block(jnp.zeros((1, 1, 1, cfg.stage_channels(i - 1)), x.dtype))

        # toRGB heads (N5): 1x1 conv to the 2-channel image, linear gain.
        rgbs = []
        for i in range(cfg.num_stages):
            head = EqualizedConv(
                cfg.num_channels, kernel_size=(1, 1), gain=1.0,
                compute_dtype=cfg.compute_dtype, name=f"to_rgb_{i}",
            )
            if i == stage:
                rgbs.append(head(feats[stage]))
            elif i == stage - 1:
                rgbs.append(head(feats[stage - 1]))
            else:
                _ = head(jnp.zeros((1, 1, 1, cfg.stage_channels(i)), x.dtype))

        if stage == 0:
            out = rgbs[0]
        else:
            prev_rgb, new_rgb = rgbs  # appended in ascending stage order
            out = lerp(upsample_nearest(prev_rgb, 2), new_rgb, alpha)

        # N6: bounded output for the GAN image — always float32 (the
        # spectral synthesis chain downstream is float32-only).
        out = out.astype(jnp.float32)
        if cfg.generator_output == "tanh":
            out = jnp.tanh(out)
        return out
