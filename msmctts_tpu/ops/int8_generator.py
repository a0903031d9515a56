"""Int8 serving path for the HiFi-GAN generator (v5e s8 MXU matmuls).

The generator is ~65% of end-to-end TTS inference time (PARITY.md), and
the v5e MXU's int8 peak is ~2x its bf16 peak while int8 activations halve
the HBM traffic of the bandwidth-bound narrow tail stages. This module
provides a post-training-quantized generator apply that consumes a TRAINED
``HifiGANGenerator`` params pytree (reference architecture:
hifigan/generator.py:10-64):

* ``quantize_generator_params`` folds weight norm (remove_weight_norm
  equivalent) and quantizes every conv/transposed-conv kernel to int8 with
  per-output-channel symmetric scales (host-side, once per checkpoint).
* ``int8_generator_apply`` runs the same graph as
  ``HifiGANGenerator.__call__`` with every hot conv computed as int8 x
  int8 -> int32 matmuls: activations are dynamically quantized per tensor
  (amax/127), convolutions are decomposed into per-tap matmuls and
  transposed convolutions into per-output-phase tap matmuls — both forms
  XLA lowers straight onto the MXU's int8 path via
  ``lax.dot_general(..., preferred_element_type=int32)``. Accumulation is
  exact int32; dequantization + bias + leaky_relu fuse into the
  surrounding elementwise ops. ``conv_post`` (k=7, C_in=32 -> 1) stays in
  float: it is negligible compute and feeds tanh directly, where the last
  fraction of a percent of quantization noise would land unfiltered on
  the waveform.

Numerics: int32 tap accumulation makes the decomposition EXACT for int8
inputs (tests/test_int8_generator.py asserts bit-parity of the conv ops
against lax.conv on the dequantized operands); end-to-end error vs the
fp32 generator comes only from the activation/weight rounding itself.
Inference-only — no VJP is defined or needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from msmctts_tpu.ops.fused_generator import _conv1d, _fold

GEN_LRELU = 0.1


# --------------------------------------------------------------- weights
def _quantize_kernel(p: dict, transposed: bool = False) -> dict:
    """WN {v, g, bias} -> {w_q int8 [k.., in, out], scale f32 [out], bias}."""
    w, b = _fold(p, transposed=transposed)
    w = np.asarray(jax.device_get(w), np.float32)
    axes = tuple(range(w.ndim - 1))  # all but out-channel
    scale = np.max(np.abs(w), axis=axes) / 127.0
    scale = np.maximum(scale, 1e-12).astype(np.float32)
    w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    node = {"w_q": w_q, "scale": scale}
    if b is not None:
        node["bias"] = np.asarray(jax.device_get(b), np.float32)
    return node


def quantize_generator_params(params: dict, decoder_config: dict) -> dict:
    """Quantize a trained HifiGANGenerator params subtree for int8 serving.

    Host-side, once per checkpoint. Returns a pytree of numpy leaves
    (int8 kernels + f32 scales/biases); ``conv_post`` keeps its folded
    float kernel.
    """
    rates = list(decoder_config["upsample_rates"])
    rks = list(decoder_config["resblock_kernel_sizes"])

    out = {"conv_pre": _quantize_kernel(params["conv_pre"])}
    for i in range(len(rates)):
        out[f"up_{i}"] = _quantize_kernel(params[f"up_{i}"], transposed=True)
        for j in range(len(rks)):
            rb = params[f"resblock_{i}_{j}"]
            out[f"resblock_{i}_{j}"] = {
                name: _quantize_kernel(rb[name]) for name in rb
            }
    w, b = _fold(params["conv_post"])
    out["conv_post"] = {
        "w": np.asarray(jax.device_get(w), np.float32),
        "bias": None if b is None else np.asarray(jax.device_get(b), np.float32),
    }
    return out


# ------------------------------------------------------------ int8 compute
def _quant_act(x):
    """Dynamic per-tensor symmetric int8: returns (q int8, scale f32[])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _dot_i8(x, w):
    """[B, T, Cin] int8 x [Cin, Cout] int8 -> [B, T, Cout] int32 (MXU s8)."""
    return jax.lax.dot_general(
        x, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def int8_conv1d(xq, w_q, padding: int, dilation: int = 1):
    """'Same'-style 1-D conv as k per-tap int8 matmuls, exact int32 accum.

    xq [B, T, Cin] int8, w_q [k, Cin, Cout] int8; padding must equal
    (k-1)//2 * dilation (odd k), mirroring the generator's conv geometry.
    """
    k = w_q.shape[0]
    B, T, _ = xq.shape
    assert padding == (k - 1) // 2 * dilation and k % 2 == 1, (k, padding, dilation)
    xp = jnp.pad(xq, ((0, 0), (padding, padding), (0, 0)))
    acc = None
    for j in range(k):
        term = _dot_i8(
            jax.lax.dynamic_slice_in_dim(xp, j * dilation, T, axis=1), w_q[j]
        )
        acc = term if acc is None else acc + term
    return acc


def int8_conv_transpose1d(xq, w_q, stride: int, padding: int):
    """Torch-semantics transposed conv as per-output-phase tap matmuls.

    Output position n = stride*t' + s draws taps i with
    (n + padding - i) % stride == 0 from input index t' + (s+padding-i)//stride
    (derivation mirrors ops/convs.WNConvTranspose1d's lhs-dilated form).
    Requires k - stride == 2*padding so out_len == T*stride exactly (true
    of every HiFi-GAN recipe here: k=[12,11,11,4], u=[6,5,5,2]).
    """
    k, _, Cout = w_q.shape
    B, T, _ = xq.shape
    u, p = stride, padding
    assert k - u == 2 * p, (k, u, p)

    taps = []  # per phase: [(kernel tap i, input offset o)]
    omin = omax = 0
    for s in range(u):
        lst = []
        for i in range(k):
            if (s + p - i) % u == 0:
                o = (s + p - i) // u
                lst.append((i, o))
                omin, omax = min(omin, o), max(omax, o)
        taps.append(lst)
    lpad, rpad = max(0, -omin), max(0, omax)
    xp = jnp.pad(xq, ((0, 0), (lpad, rpad), (0, 0)))

    phases = []
    for s in range(u):
        acc = None
        for i, o in taps[s]:
            term = _dot_i8(
                jax.lax.dynamic_slice_in_dim(xp, o + lpad, T, axis=1), w_q[i]
            )
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros((B, T, Cout), jnp.int32)
        phases.append(acc)
    y = jnp.stack(phases, axis=2)  # [B, T, u, Cout]
    return y.reshape(B, T * u, Cout)


def _dequant(y_i32, s_x, node, dtype):
    y = y_i32.astype(jnp.float32) * (s_x * jnp.asarray(node["scale"]))
    if node.get("bias") is not None:
        y = y + jnp.asarray(node["bias"])
    return y.astype(dtype)


def _lrelu(x, slope=GEN_LRELU):
    return jnp.where(x >= 0, x, slope * x)


def _resblock_i8(qp, x, kernel_size, dilations, dtype):
    for i, d in enumerate(dilations):
        h = _lrelu(x)
        q, s = _quant_act(h)
        n1 = qp[f"conv1_{i}"]
        h = _dequant(
            int8_conv1d(q, jnp.asarray(n1["w_q"]), (kernel_size - 1) // 2 * d, d),
            s, n1, dtype,
        )
        h = _lrelu(h)
        q, s = _quant_act(h)
        n2 = qp[f"conv2_{i}"]
        h = _dequant(
            int8_conv1d(q, jnp.asarray(n2["w_q"]), (kernel_size - 1) // 2),
            s, n2, dtype,
        )
        x = x + h
    return x


def int8_generator_apply(qparams, x, decoder_config, dtype=jnp.bfloat16):
    """Quantized twin of HifiGANGenerator.__call__ / fused_generator_apply.

    qparams: output of ``quantize_generator_params``; x [B, T, num_mels]
    float; returns [B, T * prod(upsample_rates), 1] in ``dtype``.
    """
    rates = list(decoder_config["upsample_rates"])
    uks = list(decoder_config["upsample_kernel_sizes"])
    rks = list(decoder_config["resblock_kernel_sizes"])
    rds = [list(d) for d in decoder_config["resblock_dilation_sizes"]]

    q, s = _quant_act(x)
    node = qparams["conv_pre"]
    x = _dequant(int8_conv1d(q, jnp.asarray(node["w_q"]), 3), s, node, dtype)
    for i, (u, k) in enumerate(zip(rates, uks)):
        x = _lrelu(x)
        q, s = _quant_act(x)
        node = qparams[f"up_{i}"]
        x = _dequant(
            int8_conv_transpose1d(q, jnp.asarray(node["w_q"]), u, (k - u) // 2),
            s, node, dtype,
        )
        acc = None
        for j, rk in enumerate(rks):
            r = _resblock_i8(qparams[f"resblock_{i}_{j}"], x, rk, rds[j], dtype)
            acc = r if acc is None else acc + r
        x = acc / len(rks)
    # final activation: torch default slope 0.01 (reference generator.py:52)
    x = _lrelu(x, 0.01)
    node = qparams["conv_post"]
    bias = None if node["bias"] is None else jnp.asarray(node["bias"])
    y = _conv1d(x.astype(jnp.float32), jnp.asarray(node["w"]), bias, padding=3)
    return jnp.tanh(y).astype(dtype)
