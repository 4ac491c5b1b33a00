"""Fused discriminator-block Pallas kernel (kernels/pallas_dblock.py):
interpret-mode equality against the literal conv->lrelu->conv->lrelu->
pool chain — values, 1st-order gradients, and the WGAN-GP-shaped
second-order composition. Compiled runs happen only on the TPU
(scripts/dblock_bench.py, CLAUDE.md convention)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gansynth_tpu.kernels.pallas_dblock import (
    _literal_chain,
    dblock_eligible,
    fused_dblock,
)


def _inputs(b=2, h=16, w=32, c1=128, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 5)
    x = jax.random.normal(ks[0], (b, h, w, 64), dtype)
    k0 = jax.random.normal(ks[1], (3, 3, 64, 64), jnp.float32) * 0.1
    b0 = jax.random.normal(ks[2], (64,), jnp.float32) * 0.1
    k1 = jax.random.normal(ks[3], (3, 3, 64, c1), jnp.float32) * 0.1
    b1 = jax.random.normal(ks[4], (c1,), jnp.float32) * 0.1
    return x, k0, b0, k1, b1


class TestForward:
    @pytest.mark.parametrize("shape", [(2, 16, 32), (1, 8, 48), (3, 12, 16)])
    def test_matches_literal_chain(self, shape):
        b, h, w = shape
        args = _inputs(b, h, w)
        got = fused_dblock(*args, 0.2, True)
        want = _literal_chain(*args, slope=0.2)
        assert got.shape == (b, h // 2, w // 2, 128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_conv1_width_64(self):
        args = _inputs(c1=64)
        got = fused_dblock(*args, 0.2, True)
        want = _literal_chain(*args, slope=0.2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_bfloat16_close(self):
        args = _inputs(dtype=jnp.bfloat16)
        got = np.asarray(fused_dblock(*args, 0.2, True), np.float32)
        want = np.asarray(_literal_chain(*args, slope=0.2), np.float32)
        # bf16 in, f32 accumulation inside both paths; last-bits only.
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)

    def test_edge_zeros_behave_as_same_padding(self):
        """An impulse in the image corner must spread exactly as SAME
        padding dictates — the masked-garbage halo must not leak."""
        x, k0, b0, k1, b1 = _inputs(1, 8, 16)
        x = jnp.zeros_like(x).at[0, 0, 0, 0].set(3.0)
        got = fused_dblock(x, k0, jnp.zeros_like(b0), k1,
                           jnp.zeros_like(b1), 0.2, True)
        want = _literal_chain(x, k0, jnp.zeros_like(b0), k1,
                              jnp.zeros_like(b1), slope=0.2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


class TestGradients:
    def test_first_order_matches(self):
        args = _inputs(1, 8, 16)

        def loss_fused(*a):
            return jnp.sum(fused_dblock(*a, 0.2, True) ** 2)

        def loss_lit(*a):
            return jnp.sum(_literal_chain(*a, slope=0.2) ** 2)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
        g_lit = jax.grad(loss_lit, argnums=(0, 1, 2, 3, 4))(*args)
        # The cotangent feeding the VJP comes through the FUSED forward
        # (f32 tap-order accumulation) vs the literal conv order —
        # reassociation noise only, bounded here.
        for gf, gl in zip(g_fused, g_lit):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gl),
                                       rtol=1e-3, atol=1e-4)

    def test_second_order_gp_composition(self):
        """The WGAN-GP shape: d/dparams of ||d block(x)/dx||^2 — the
        custom VJP's remat-chain must stay differentiable."""
        x, k0, b0, k1, b1 = _inputs(1, 8, 16)

        def gp(k0_, which):
            fn = fused_dblock if which == "fused" else (
                lambda *a, **kw: _literal_chain(*a, slope=0.2)
            )

            def critic(xi):
                if which == "fused":
                    return jnp.sum(fn(xi, k0_, b0, k1, b1, 0.2, True))
                return jnp.sum(fn(xi, k0_, b0, k1, b1))

            gx = jax.grad(critic)(x)
            return jnp.sum(gx ** 2)

        gg_fused = jax.grad(gp)(k0, "fused")
        gg_lit = jax.grad(gp)(k0, "literal")
        assert np.isfinite(np.asarray(gg_fused)).all()
        np.testing.assert_allclose(np.asarray(gg_fused),
                                   np.asarray(gg_lit),
                                   rtol=1e-4, atol=1e-5)


class TestEligibility:
    def test_gate(self):
        assert dblock_eligible((8, 128, 1024, 64), 64, 128)  # stage 6
        assert not dblock_eligible((8, 64, 512, 128), 128, 256)  # stage 5
        assert not dblock_eligible((8, 128, 1024, 64), 128, 128)
        assert not dblock_eligible((8, 130, 1024, 64), 64, 128)
        assert not dblock_eligible((8, 128, 1020, 64), 64, 128)
        assert not dblock_eligible((8, 4, 16, 64), 64, 128)  # too short


class TestModelIntegration:
    def test_block_param_tree_interchangeable(self, monkeypatch):
        """DiscriminatorBlock(dblock_kernel='pallas') declares the SAME
        param tree as the XLA path and computes the same function — a
        checkpoint trained either way restores into the other."""
        from gansynth_tpu.kernels import pallas_dblock as pd
        from gansynth_tpu.models.discriminator import DiscriminatorBlock

        real = pd.fused_dblock
        monkeypatch.setattr(
            pd, "fused_dblock",
            lambda x, k0, b0, k1, b1, slope, interpret: real(
                x, k0, b0, k1, b1, slope, True
            ),
        )
        x = jax.random.normal(jax.random.key(0), (2, 8, 32, 64))
        fused = DiscriminatorBlock(64, 96, dblock_kernel="pallas")
        xla = DiscriminatorBlock(64, 96, dblock_kernel="xla")
        params = fused.init(jax.random.key(1), x)
        params_xla = xla.init(jax.random.key(1), x)
        assert jax.tree.structure(params) == jax.tree.structure(params_xla)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_xla)):
            assert a.shape == b.shape and a.dtype == b.dtype
        got = fused.apply(params, x)
        want = xla.apply(params, x)
        assert got.shape == want.shape == (2, 4, 16, 96)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_ineligible_stage_falls_back_to_xla(self):
        """A 128-channel (stage-5-shaped) input must take the XLA path
        even under dblock_kernel='pallas' — no silent wrong-kernel use."""
        from gansynth_tpu.models.discriminator import DiscriminatorBlock

        x = jax.random.normal(jax.random.key(0), (2, 8, 32, 128))
        blk = DiscriminatorBlock(128, 96, dblock_kernel="pallas")
        params = blk.init(jax.random.key(1), x)
        out = blk.apply(params, x)  # would crash in the fused path
        assert out.shape == (2, 4, 16, 96)
