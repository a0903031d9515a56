"""Pallas TPU kernel: fused HiFi-GAN dilated residual layer.

One ResBlock1 dilation layer is ``x + conv_k1(lrelu(dconv_kd(lrelu(x))))``
(hifigan/common.py:21-58) — in XLA this materializes two conv intermediates
in HBM per layer, nine times per upsampling stage. This kernel computes the
whole layer per time tile in VMEM and only the residual-added result
returns to HBM.

Mosaic-alignment design: overlapping halo tiles are DMA'd manually from
HBM (block-granular BlockSpecs cannot express overlap), and every compute
op stays FULL-BUFFER shaped so all shapes are (8, 128)-tile aligned:

  * tap shifts are ``pltpu.roll`` on the whole [tin, C] buffer instead of
    unaligned slices; each conv is then k full-size [tin, C] x [C, C] MXU
    matmuls,
  * rows polluted by roll wrap-around live strictly inside the halo
    (first/last halo1 rows for conv1, halo rows for conv2) and are never
    read by the final ALIGNED output slice at [HA, HA + tile),
  * the halo HA is rounded up to a multiple of 8 so DMA slices and the
    output slice are sublane-aligned.

Weights are [k, C, C] (tap, in, out). Supported envelope: C a multiple of
128 (lane width) and C <= 256 so both convs' weights (<= 2*11*256^2*4 =
5.8 MB) stay comfortably in VMEM — the first two HiFi-GAN MRF stages.

Optional acceleration path; the default generator keeps XLA convs. Parity
vs the unfused XLA composition (incl. per-conv zero-padding semantics at
sequence bounds) holds in interpret mode (tests/test_pallas_resblock.py)
AND on real TPU hardware (max abs err <= 2e-6 at C=256/k=3 and
C=128/k=11, fp32 HIGHEST-precision dots).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 512
LRELU_SLOPE = 0.1


def _leaky(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _roll_rows(x, shift: int, interpret: bool):
    """Circular row shift. pltpu.roll is TPU-only and requires a
    non-negative shift (circularity makes shift mod rows equivalent);
    interpret mode (and the zero-shift case) use jnp.roll."""
    shift = shift % x.shape[0]
    if shift == 0:
        return x
    if interpret:
        return jnp.roll(x, shift, axis=0)
    return pltpu.roll(x, shift, 0)


def _make_kernel(k, dilation, halo1, halo2, ha, tile, T_true, interpret):
    tin = tile + 2 * ha

    def kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, scratch, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)

        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(t * tile, tin), :], scratch, sem
        )
        dma.start()
        dma.wait()
        x = scratch[...]
        C = x.shape[-1]

        h = _leaky(x)
        # conv1: full-buffer tap shifts; rows < halo1 or >= tin - halo1 wrap
        acc = jnp.zeros((tin, C), jnp.float32)
        for j in range(k):
            shifted = _roll_rows(h, halo1 - j * dilation, interpret)
            acc += jnp.dot(
                shifted, w1_ref[j],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        mid = _leaky(acc + b1_ref[...].reshape(1, C))

        # zero mid outside the true sequence: the unfused composition
        # zero-pads conv2's (post-activation) input at sequence bounds
        pos = t * tile + jax.lax.broadcasted_iota(jnp.int32, (tin, 1), 0) - ha
        valid = (pos >= 0) & (pos < T_true)
        mid = mid * valid.astype(mid.dtype)

        # conv2 (dilation 1): wrap pollution reaches halo1 + halo2 <= ha rows
        acc2 = jnp.zeros((tin, C), jnp.float32)
        for j in range(k):
            shifted = _roll_rows(mid, halo2 - j, interpret)
            acc2 += jnp.dot(
                shifted, w2_ref[j],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        y = acc2 + b2_ref[...].reshape(1, C)

        # aligned output slice: [HA, HA + tile) never touches wrapped rows
        out_ref[...] = (x[ha : ha + tile] + y[ha : ha + tile]).reshape(1, tile, C)

    return kernel


@functools.partial(jax.jit, static_argnames=("dilation", "interpret"))
def fused_resblock_layer(x, w1, b1, w2, b2, dilation: int, interpret: bool = False):
    """x [B, T, C]; w1/w2 [k, C, C] (tap, in, out); b1/b2 [C] -> [B, T, C].

    Equivalent to x + conv1d(lrelu(dconv1d(lrelu(x), w1, b1, dilation)),
    w2, b2) with torch 'same' padding on both convs."""
    B, T, C = x.shape
    if C % 128 != 0:
        raise ValueError(
            f"fused_resblock_layer requires lane-aligned channels (C % 128 == 0), got {C}"
        )
    k = w1.shape[0]
    halo1 = (k - 1) // 2 * dilation
    halo2 = (k - 1) // 2
    ha = -((halo1 + halo2) // -8) * 8  # total halo, rounded up to sublanes

    t_pad = (-T) % TILE_T
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (ha, ha + t_pad), (0, 0)))
    Tp = T + t_pad
    grid = (B, Tp // TILE_T)
    tin = TILE_T + 2 * ha

    out = pl.pallas_call(
        _make_kernel(k, dilation, halo1, halo2, ha, TILE_T, T, interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # full padded x stays in HBM
            pl.BlockSpec((k, C, C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((k, C, C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tin, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        xp,
        w1.astype(jnp.float32),
        b1.astype(jnp.float32),
        w2.astype(jnp.float32),
        b2.astype(jnp.float32),
    )
    return out[:, :T].astype(x.dtype)
