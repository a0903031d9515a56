"""Serving-path HiFi-GAN generator with Pallas-fused MRF resblocks.

``fused_generator_apply`` consumes a TRAINED ``HifiGANGenerator`` params
pytree unchanged: weight-norm (v, g) pairs are folded to dense kernels on
the fly, upsampling/transposed convs and the pre/post convs run as XLA
convs, and every MRF dilation layer whose channel count is lane-aligned
(C % 128 == 0, C <= 256 — the first two CSMSC stages) runs through the
fused Pallas kernel (ops/pallas_resblock.py); narrower stages fall back
to XLA. Inference-only (the Pallas op defines no VJP).

This realizes the BASELINE "fused transposed-conv + MRF upsampling"
deployment path without touching training checkpoints: parity vs
``HifiGANGenerator.apply`` is tested in tests/test_fused_generator.py
(and measured at max abs err 8.6e-7 on real TPU at full CSMSC scale).

Measured honestly (chained timing, fresh inputs): the fused path runs at
0.85x the XLA generator on v5e — XLA's conv fusion is already strong, and
this kernel pays halo over-compute and fp32 HIGHEST dots. XLA therefore
remains the default; the kernel stands as the validated fusion skeleton
(per-phase tap matmuls would need bf16 dots + halo-exact tiles to win).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from msmctts_tpu.ops.convs import _wn_kernel
from msmctts_tpu.ops.pallas_resblock import LRELU_SLOPE, fused_resblock_layer


def _fold(p, transposed=False):
    """WNConv/WNConvTranspose1d params {v, g, bias} -> (kernel, bias)."""
    v, g = p["v"], p["g"]
    ndim = v.ndim
    if transposed:
        norm_axes = (0, 2)  # per-input-channel (torch transposed dim=0)
    else:
        norm_axes = tuple(range(ndim - 1))  # all but out-channel
    return _wn_kernel(v, g, norm_axes), p.get("bias")


def _conv1d(x, kernel, bias, stride=1, padding=0, dilation=1):
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out + bias.astype(out.dtype) if bias is not None else out


def _conv_transpose1d(x, kernel, bias, stride, padding):
    k = kernel.shape[0]
    out = jax.lax.conv_general_dilated(
        x,
        jnp.flip(kernel, axis=0).astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out + bias.astype(out.dtype) if bias is not None else out


def _resblock(params, x, kernel_size, dilations, use_pallas):
    C = x.shape[-1]
    for i, d in enumerate(dilations):
        w1, b1 = _fold(params[f"conv1_{i}"])
        w2, b2 = _fold(params[f"conv2_{i}"])
        if use_pallas and C % 128 == 0 and C <= 256:
            x = fused_resblock_layer(x, w1, b1, w2, b2, d)
        else:
            h = jnp.where(x >= 0, x, LRELU_SLOPE * x)
            h = _conv1d(h, w1, b1, padding=(kernel_size - 1) // 2 * d, dilation=d)
            h = jnp.where(h >= 0, h, LRELU_SLOPE * h)
            h = _conv1d(h, w2, b2, padding=(kernel_size - 1) // 2)
            x = x + h
    return x


def fused_generator_apply(params, x, decoder_config, use_pallas: bool = True):
    """params: the 'params' subtree of a trained HifiGANGenerator;
    x [B, T, num_mels]; decoder_config: the generator's YAML node."""
    rates = list(decoder_config["upsample_rates"])
    uks = list(decoder_config["upsample_kernel_sizes"])
    rks = list(decoder_config["resblock_kernel_sizes"])
    rds = [list(d) for d in decoder_config["resblock_dilation_sizes"]]
    c0 = int(decoder_config["upsample_initial_channel"])

    w, b = _fold(params["conv_pre"])
    x = _conv1d(x, w, b, padding=3)
    for i, (u, k) in enumerate(zip(rates, uks)):
        x = jnp.where(x >= 0, x, LRELU_SLOPE * x)
        w, b = _fold(params[f"up_{i}"], transposed=True)
        x = _conv_transpose1d(x, w, b, u, (k - u) // 2)
        acc = None
        for j, (rk, rd) in enumerate(zip(rks, rds)):
            r = _resblock(params[f"resblock_{i}_{j}"], x, rk, rd, use_pallas)
            acc = r if acc is None else acc + r
        x = acc / len(rks)
    # final activation uses the torch DEFAULT slope 0.01, not LRELU_SLOPE
    # (reference generator.py:52; matches models/hifigan.py)
    x = jnp.where(x >= 0, x, 0.01 * x)
    w, b = _fold(params["conv_post"])
    return jnp.tanh(_conv1d(x, w, b, padding=3))
