"""Equivalence tests for the fused/mixed-precision layer variants: the
perf path must compute the same function as the reference-shaped path."""

import numpy as np

import jax
import jax.numpy as jnp

from gansynth_tpu.models import (
    Discriminator,
    EqualizedConv,
    EqualizedUpConv,
    Generator,
)
from gansynth_tpu.models.layers import upsample_nearest
from gansynth_tpu.utils.config import ModelConfig


class TestFusedUpConv:
    def test_matches_upsample_then_conv(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 8, 5)).astype(np.float32))
        fused = EqualizedUpConv(7)
        plain = EqualizedConv(7)
        params = fused.init(jax.random.key(0), x)
        # identical param tree (checkpoint-interchangeable)
        y_fused = fused.apply(params, x)
        y_plain = plain.apply(params, upsample_nearest(x, 2))
        assert y_fused.shape == y_plain.shape == (2, 8, 16, 7)
        np.testing.assert_allclose(
            np.asarray(y_fused), np.asarray(y_plain), atol=1e-5
        )

    def test_param_shapes_match_plain_conv(self, rng):
        x = jnp.zeros((1, 2, 2, 3))
        fused = EqualizedUpConv(4).init(jax.random.key(0), x)
        plain = EqualizedConv(4).init(jax.random.key(0), upsample_nearest(x, 2))
        assert jax.tree.map(lambda p: p.shape, fused) == jax.tree.map(
            lambda p: p.shape, plain
        )


class TestMixedPrecision:
    CFG32 = ModelConfig(latent_dim=8, fmap_base=64, fmap_max=16, fmap_min=8)
    CFG16 = ModelConfig(
        latent_dim=8, fmap_base=64, fmap_max=16, fmap_min=8,
        compute_dtype="bfloat16",
    )

    def test_generator_bf16_close_to_f32(self, rng):
        z = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
        labels = jax.nn.one_hot(jnp.asarray([10, 50]), 61)
        g32, g16 = Generator(self.CFG32), Generator(self.CFG16)
        params = g32.init(jax.random.key(0), z, labels, 3)
        out32 = np.asarray(g32.apply(params, z, labels, 3, jnp.float32(0.5)))
        out16 = np.asarray(g16.apply(params, z, labels, 3, jnp.float32(0.5)))
        assert out16.dtype == np.float32  # image output always f32
        # tanh-bounded outputs: absolute agreement at bf16 resolution
        assert np.abs(out32 - out16).max() < 0.1
        assert np.corrcoef(out32.ravel(), out16.ravel())[0, 1] > 0.99

    def test_discriminator_bf16_close_to_f32(self, rng):
        img = jnp.asarray(rng.standard_normal((4, 4, 32, 2)).astype(np.float32))
        d32, d16 = Discriminator(self.CFG32), Discriminator(self.CFG16)
        params = d32.init(jax.random.key(0), img, 1)
        c32, l32 = d32.apply(params, img, 1, jnp.float32(1.0))
        c16, l16 = d16.apply(params, img, 1, jnp.float32(1.0))
        assert np.asarray(c16).dtype == np.float32
        scale = max(float(jnp.abs(c32).max()), 1.0)
        assert float(jnp.abs(c32 - c16).max()) / scale < 0.1
