"""Pallas TPU kernel: fused HiFi-GAN dilated residual layer.

One ResBlock1 dilation layer is ``x + conv_k1(lrelu(dconv_kd(lrelu(x))))``
(hifigan/common.py:21-58) — in XLA this materializes two conv intermediates
in HBM per layer, nine times per upsampling stage. This kernel computes the
whole layer per time tile in VMEM:

  * the input stays in HBM; each grid step DMAs one tile WITH ITS HALO
    ((k-1)/2*(d+1) samples each side) into VMEM scratch — overlapping reads
    that block-granular BlockSpecs cannot express,
  * each conv is k shifted [T, C] x [C, C] matmuls (taps unrolled on the
    MXU; channels ride the lane dimension),
  * only the residual-added result returns to HBM.

Weights are [k, C, C] (tap, in, out). At C <= 512, k <= 11 both convs'
weights (2*11*512^2*4 = 23 MB) exceed VMEM, so C <= 256 is the supported
envelope — exactly the HiFi-GAN stages after the first upsample.

STATUS: experimental. Numerics are validated in interpret mode
(tests/test_pallas_resblock.py); the Mosaic TPU compiler in this dev
environment rejects the unaligned (tile + 2*halo)-row intermediate shapes
(remote-compile 500) — aligning the halo regions to the (8, 128) tile
grid is the known fix and is left for a future round. The default
generator keeps XLA convs, which profile near the same throughput (the
elementwise chain already fuses; only one conv intermediate per layer is
saved).
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


def _make_kernel(k: int, dilation: int, halo1: int, halo2: int, tile: int, T_true: int):
    halo = halo1 + halo2
    tin = tile + 2 * halo

    def kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, scratch, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)

        # overlapping halo tile: DMA from HBM (x is pre-padded by `halo`)
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(t * tile, tin), :], scratch, sem
        )
        dma.start()
        dma.wait()
        x = scratch[...]

        C = x.shape[-1]
        h = _leaky(x)
        mid_len = tin - 2 * halo1
        acc = jnp.zeros((mid_len, C), jnp.float32)
        for j in range(k):
            off = j * dilation
            acc += jnp.dot(
                h[off : off + mid_len], w1_ref[j],
                preferred_element_type=jnp.float32,
            )
        mid = _leaky(acc + b1_ref[...].reshape(1, C))
        # conv2 zero-pads its (post-activation) input at SEQUENCE bounds in
        # the unfused composition; replicate by zeroing mid outside [0, T)
        pos = t * tile + halo1 + jax.lax.broadcasted_iota(
            jnp.int32, (mid_len, 1), 0
        )
        valid = (pos >= halo) & (pos < halo + T_true)
        mid = mid * valid.astype(mid.dtype)

        out_len = mid_len - 2 * halo2
        acc2 = jnp.zeros((out_len, C), jnp.float32)
        for j in range(k):
            acc2 += jnp.dot(
                mid[j : j + out_len], w2_ref[j],
                preferred_element_type=jnp.float32,
            )
        y = acc2 + b2_ref[...].reshape(1, C)

        center = halo
        out_ref[...] = (x[center : center + out_len] + y).reshape(1, out_len, C)

    return kernel


@functools.partial(jax.jit, static_argnames=("dilation", "interpret"))
def fused_resblock_layer(x, w1, b1, w2, b2, dilation: int, interpret: bool = False):
    """x [B, T, C]; w1/w2 [k, C, C] (tap, in, out); b1/b2 [C] -> [B, T, C].

    Equivalent to x + conv1d(lrelu(dconv1d(lrelu(x), w1, b1, dilation)),
    w2, b2) with torch 'same' padding on both convs."""
    B, T, C = x.shape
    k = w1.shape[0]
    halo1 = (k - 1) // 2 * dilation
    halo2 = (k - 1) // 2
    halo = halo1 + halo2

    t_pad = (-T) % TILE_T
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (halo, halo + t_pad), (0, 0)))
    Tp = T + t_pad
    grid = (B, Tp // TILE_T)
    tin = TILE_T + 2 * halo

    out = pl.pallas_call(
        _make_kernel(k, dilation, halo1, halo2, TILE_T, T),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # full padded x, HBM
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
