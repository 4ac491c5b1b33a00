"""Pallas TPU kernel: 3x3 SAME convolution over VMEM-resident row bands.

History (DESIGN.md §2c): the per-op trace of the 128x1024 training step
attributed ~10-15% useful MXU to the stage-6 convolutions, and this
kernel was built as the "third path" after materialized im2col and
space-to-depth lost on measurement: stage a band of full-width image
rows INTO VMEM once (HBM sees each input element ~once, plus a
(th+2)/th row-halo factor), then run the nine tap contractions as plain
2-D MXU matmuls against data that never leaves VMEM between taps.

Measured outcome (scripts/pallas_conv_bench.py, the accept-or-reject
discipline): REJECTED as a performance lever. In a steady-state
microbench the XLA conv emitter runs the very same shapes at 128-151
TFLOP/s (65-77% of v5e bf16 peak) — the in-step 10-15% reading is
memory-pressure inside the fused training program, not emitter
scheduling, and this kernel (62-76 TFLOP/s; the shifted tap loads and
halo DMA dominate) cannot beat a bandwidth bound by re-reading the same
HBM. It is kept as an exercised alternative lowering
(``ModelConfig.conv_kernel="pallas"``), equality-tested in interpret
mode on CPU and compiled on TPU (bf16 bit-exact at C=128).

Layout: the caller zero-pads spatially (1 row top/bottom; 1 column left,
and right up to ``Wp = round_up(W + 2, 8)`` so every sublane slice stays
tile-aligned) and flattens (H+2, Wp) into ONE row axis, so the image is
a [B, (H+2)*Wp, C] array in which the tap at (dy, dx) of the output
pixel flattened to row r is simply row ``r + dy*Wp + dx``. Each grid
step DMAs the contiguous band of (th+2) full rows (alignment-free by
construction — full-extent in the last axis, 8-aligned in the flat row
axis), computes ``sum_t x_band[shift_t] @ k_t`` with float32
accumulation, and writes the th valid output rows back, slicing away the
Wp-W halo columns (an 8-aligned slice, since Wp and W are both 8-mult).
Flattening makes a tap window "wrap" across image rows only for the
halo-column outputs, which are exactly the ones sliced away.

Shape contract: NHWC, stride 1, SAME (zero) padding, 3x3 kernel,
W % 8 == 0, H % th == 0 (th chosen per shape), C_in a lane-friendly
width (the progressive ladder's 32/64/128/256). C_in = 64 — the stage-6
width, where the trace showed the XLA emitter at its worst in-step MXU
occupancy — routes through the PIXEL-PAIRING layout (VERDICT r3 item 5):
two adjacent pixels share one flat row (128 lanes full), and the three
paired-column taps carry block-structured [128, 2*C_out] kernels
(``_paired_tap_kernels``); see ``_conv3x3_pallas_paired``.

Differentiation: ``conv3x3_same`` carries a custom VJP whose input
gradient is ANOTHER ``conv3x3_same`` call (the adjoint of a stride-1
SAME 3x3 conv is a SAME 3x3 conv with the spatially-flipped,
io-transposed kernel), so reverse-over-reverse autodiff — WGAN-GP's
grad-of-grad-of-critic — composes to any order. The kernel gradient is a
plain XLA contraction (natively differentiable; it is a skinny
[9*C_in, C_out]-shaped reduction XLA schedules fine).

The XLA lowering (``lax.conv_general_dilated`` in models/layers.py)
remains the reference implementation; this kernel is selected via
``ModelConfig.conv_kernel = "pallas"`` and equality-tested against it
(interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the per-band working set (band + f32 accumulator +
# tap-matmul temporaries; the 3x c_out factor was sized against a
# measured Mosaic stack OOM at the f32 stage-4 shape).
_BAND_BUDGET_BYTES = 8 * 1024 * 1024


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _tile_rows(h: int, w: int, c_in: int, c_out: int, itemsize: int) -> int:
    """Rows per band: divide H, fit the band working set in budget."""
    wp = _round_up(w + 2, 8)
    per_row = wp * (c_in * itemsize + 3 * c_out * 4)
    th = min(h, max(1, _BAND_BUDGET_BYTES // per_row))
    while h % th:
        th -= 1
    return th


def _conv_kernel(th: int, wp: int, c_in: int, c_out: int, w: int, out_dtype):
    def kernel(x_hbm, k_ref, o_ref, band, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        # One contiguous DMA: (th+2) full padded rows of image b, plus 8
        # spare flat rows so the last tap shift (+2*wp+2) stays in
        # bounds (the flattened tap of the last halo-column output wraps
        # 2 rows past the band; the caller pads the image accordingly).
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * th * wp, (th + 2) * wp + 8), :],
            band,
            sem,
        )
        cp.start()
        cp.wait()
        # Nine tap matmuls, f32 accumulation: the tap at (dy, dx) of the
        # output pixel flattened to row r is band row r + dy*wp + dx.
        acc = None
        for dy in range(3):
            for dx in range(3):
                x_tap = band[pl.ds(dy * wp + dx, th * wp), :]
                contrib = jax.lax.dot_general(
                    x_tap,
                    k_ref[3 * dy + dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = contrib if acc is None else acc + contrib
        # Write the th valid rows, stripping the wp-w halo columns.
        for y in range(th):
            o_ref[0, y] = acc[y * wp:y * wp + w, :].astype(out_dtype)

    return kernel


def _paired_tap_kernels(kernel: jax.Array) -> jax.Array:
    """Assemble the pixel-pairing tap kernels: [3, 3, 64, C_out] ->
    [9, 128, 2*C_out].

    In the paired layout one flat row holds TWO adjacent image pixels
    (channels concatenated: lanes 0:64 = even pixel, 64:128 = odd pixel),
    so a C_in=64 conv fills the MXU's 128-lane tile. The tap at paired-
    column shift dj in {-1, 0, +1} is a 128 x 2*C_out matrix whose four
    64 x C_out blocks route each input pixel's channels to the output
    pixel that the ORIGINAL 3x3 taps connect them to:

        out even pixel (col 2j): input cols 2j-1, 2j, 2j+1
          = (pair j-1, odd) k[:,0] | (pair j, even) k[:,1] | (pair j, odd) k[:,2]
        out odd  pixel (col 2j+1): input cols 2j, 2j+1, 2j+2
          = (pair j, even) k[:,0] | (pair j, odd) k[:,1] | (pair j+1, even) k[:,2]

    The dj = +/-1 taps are three-quarters zeros (2x nominal FLOPs
    overall) — the trade is full 128-lane MXU occupancy vs the naive
    64-lane layout's 4x systolic-array waste.
    """
    c_in, c_out = kernel.shape[2], kernel.shape[3]
    assert c_in == 64, "pixel pairing is the C_in=64 layout"
    taps = []
    for dy in range(3):
        k = kernel[dy]  # [3, 64, C_out]
        z = jnp.zeros((64, c_out), kernel.dtype)
        # dj = -1: only the odd pixel of the previous pair feeds out-even.
        km1 = jnp.concatenate(
            [jnp.concatenate([z, z], 1),            # even-in rows
             jnp.concatenate([k[0], z], 1)], 0)     # odd-in rows
        # dj = 0: the dense center tap.
        k0 = jnp.concatenate(
            [jnp.concatenate([k[1], k[0]], 1),      # even-in rows
             jnp.concatenate([k[2], k[1]], 1)], 0)  # odd-in rows
        # dj = +1: only the even pixel of the next pair feeds out-odd.
        kp1 = jnp.concatenate(
            [jnp.concatenate([z, k[2]], 1),
             jnp.concatenate([z, z], 1)], 0)
        taps += [km1, k0, kp1]
    return jnp.stack(taps)  # [9, 128, 2*C_out]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_pallas_paired(x, kernel, *, interpret: bool = False):
    """Pixel-pairing forward for C_in=64 (the stage-6 width): runs the
    SAME band kernel as :func:`_conv3x3_pallas` over a [B, H, W/2, 128]
    paired view, with the block-structured tap kernels above, then
    un-pairs the [.., W/2, 2*C_out] result (a free last-axes reshape).
    """
    b, h, w, c_in = x.shape
    c_out = kernel.shape[-1]
    wh = w // 2
    wpp = _round_up(wh + 2, 8)
    th = _tile_rows(h, wh, 2 * c_in, 2 * c_out, x.dtype.itemsize)
    # Columns: one halo PAIR each side (the dj taps reach one pair out),
    # plus zero pairs to the tile-aligned paired width. Rows: 1 halo top,
    # 1 halo + 1 spare bottom (the band DMA's +8 flat-row overrun).
    xp = jnp.pad(x, ((0, 0), (1, 2), (2, 2 * wpp - w - 2), (0, 0)))
    xp = xp.reshape(b, (h + 3) * wpp, 2 * c_in)
    k9 = _paired_tap_kernels(kernel).astype(x.dtype)
    out = pl.pallas_call(
        _conv_kernel(th, wpp, 2 * c_in, 2 * c_out, wh, x.dtype),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (9, 2 * c_in, 2 * c_out), lambda b, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wh, 2 * c_out),
            lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wh, 2 * c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(((th + 2) * wpp + 8, 2 * c_in), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, k9)
    return out.reshape(b, h, w, c_out)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_pallas(x, kernel, *, interpret: bool = False):
    """Forward pallas_call. x [B, H, W, C_in], kernel [3, 3, C_in, C_out]."""
    b, h, w, c_in = x.shape
    c_out = kernel.shape[-1]
    if c_in == 64 and w % 2 == 0:
        # 64 channels fill only half the 128-lane tile (and Mosaic
        # rejects the 64-of-128 lane DMA outright); route through the
        # pixel-pairing layout instead. Odd widths (interpret-mode
        # corner; never eligible compiled) stay on the unpaired path.
        return _conv3x3_pallas_paired(x, kernel, interpret=interpret)
    wp = _round_up(w + 2, 8)
    th = _tile_rows(h, w, c_in, c_out, x.dtype.itemsize)
    # Pad: 1 halo row top, 1 halo + 1 spare row bottom (the spare keeps
    # the last band's +8-row DMA overrun in bounds), halo columns to wp.
    xp = jnp.pad(
        x, ((0, 0), (1, 2), (1, wp - w - 1), (0, 0))
    ).reshape(b, (h + 3) * wp, c_in)
    k9 = kernel.astype(x.dtype).reshape(9, c_in, c_out)
    return pl.pallas_call(
        _conv_kernel(th, wp, c_in, c_out, w, x.dtype),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM; band DMA
            pl.BlockSpec(
                (9, c_in, c_out), lambda b, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, c_out),
            lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(((th + 2) * wp + 8, c_in), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, k9)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_same(x, kernel, interpret: bool = False):
    """NHWC stride-1 SAME 3x3 conv on the MXU via VMEM row bands.

    Same contraction as ``lax.conv_general_dilated(x, kernel, (1, 1),
    "SAME")`` with f32 accumulation, output in ``x.dtype``. Arbitrarily
    re-differentiable (see module docstring).
    """
    return _conv3x3_pallas(x, kernel, interpret=interpret)


def _conv_fwd(x, kernel, interpret):
    # Re-enter the custom_vjp-wrapped function (not the raw pallas_call):
    # higher-order reverse AD linearizes the whole inner-gradient trace,
    # including this fwd pass, and a bare pallas_call has no JVP rule —
    # the recursive call keeps every appearance behind the custom rule.
    return conv3x3_same(x, kernel, interpret), (x, kernel)


def _conv_bwd(interpret, res, g):
    x, kernel = res
    # Adjoint wrt input: SAME conv of g with the spatially-flipped,
    # io-transposed kernel — another conv3x3_same call, so higher-order
    # differentiation recurses through this same VJP.
    k_flip = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = conv3x3_same(g, k_flip.astype(g.dtype), interpret)
    # Adjoint wrt kernel: dw[dy,dx,i,o] = sum_{b,y,x} xp[b,y+dy,x+dx,i] *
    # g[b,y,x,o] — a conv over the batch dim (XLA native, differentiable).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jax.lax.conv_general_dilated(
        xp.transpose(3, 1, 2, 0),        # [C_in, H+2, W+2, B]
        g.transpose(1, 2, 0, 3),         # [H, W, B, C_out]
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 0, 3)              # [3, 3, C_in, C_out]
    return dx.astype(x.dtype), dw.astype(kernel.dtype)


conv3x3_same.defvjp(_conv_fwd, _conv_bwd)


def conv3x3_eligible(x_shape, kernel_shape) -> bool:
    """Shapes the COMPILED kernel handles (the ladder's 128/256-channel
    stages).

    C_in must be a multiple of the 128-lane tile: Mosaic physically pads
    the HBM memref's lane dimension to 128, and a DMA slice over a
    64-of-128 lane extent is rejected at compile time (measured on the
    stage-6 shape). The C=64 pixel-pairing layout
    (``_conv3x3_pallas_paired``) works around that, but the round-4
    real-chip microbench retired it for COMPILED use: 4586 us vs XLA's
    613 us forward on the stage-6 trunk conv (7.5x slower — the 2x
    nominal-FLOP padding plus Mosaic's pipeline can't beat the XLA
    emitter there; runs/flagship_r4/bench/r4_pallas_conv_bench.log), so
    opt-in `conv_kernel='pallas'` users must not be routed onto it. It
    stays reachable for interpret-mode tests and explicit benchmarking
    (scripts/pallas_conv_bench.py calls it directly). Interpret mode
    (tests) accepts any C_in.
    """
    if len(x_shape) != 4 or tuple(kernel_shape[:2]) != (3, 3):
        return False
    _, h, w, c_in = x_shape
    return (
        c_in % 128 == 0
        and c_in <= 512
        and w % 16 == 0
        and w >= 128
        and h >= 2
    )
