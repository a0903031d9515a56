"""Quantization-aware fine-tuning (QAT) for the int8 HiFi-GAN decoder.

Post-training int8 with per-channel weights + static per-tensor activation
scales + a SmoothQuant fold bottoms out at ~+8% rel AS-MCD on trained
CSMSC-scale weights (ab_int8_r4.json): the residual error is distributed
per-tensor rounding noise that no calibration trick removes. The standard
remedy is a brief straight-through-estimator fine-tune — train the FOLDED
decoder kernels through a fake-quant twin of the serving graph so the
weights move to quantization-friendly points.

This module provides that twin: ``qat_generator_apply`` mirrors
``ops/int8_generator.int8_generator_apply`` site for site (conv_pre ->
up_i + MRF resblocks -> float conv_post -> tanh; reference architecture
/root/reference/hifigan/generator.py:10-64) but computes every quantized
conv in float with fake-quant STE operands:

* weights: per-output-channel symmetric fake-quant of the folded kernel
  (after the SmoothQuant ``s_in`` multiply, exactly as serving quantizes),
  scale detached, gradient = identity through the rounding;
* activations: static per-tensor scales (the serving calibration's), with
  the matching ``1/s_in`` SmoothQuant divide before rounding; STE again.

Because both operand grids match the serving quantizer exactly, the only
numeric difference from the true int8 path is fp32-vs-int32 accumulation
(bit-level identical up to fp32 mantissa; tests assert ~1e-3 rel). A
checkpoint fine-tuned through this graph therefore serves UNCHANGED
through ``Int8Decoder`` — QAT'd kernels are written back into the
weight-norm parametrization (v = w, g = ||w||) so every existing tool
(infer.py --int8, as_mcd_sweep.py --int8, serve.py --int8) just works.

Driver: tools/qat_int8.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from msmctts_tpu.ops.fused_generator import _conv1d, _conv_transpose1d
from msmctts_tpu.ops.int8_generator import (
    GEN_LRELU,
    _fold_generator_params,
    _observe_act_amax,
    _quantize_folded,
    build_smoothing,
)


def fold_decoder_params(params: dict, decoder_config: dict) -> dict:
    """Trained weight-norm decoder params -> trainable flat pytree
    ``{site: {"w": f32, "bias": f32|None}}`` (same site names as the int8
    qparams / activation scales)."""
    folded = _fold_generator_params(params, decoder_config)
    return {
        site: {"w": w, "bias": b} for site, (w, b) in folded.items()
    }


def unfold_to_weight_norm(folded: dict, params: dict, decoder_config: dict) -> dict:
    """Write QAT'd folded kernels back into a weight-norm params subtree.

    ``v = w, g = ||w||`` reproduces the kernel exactly under the model's
    weight-norm fold (g * v / ||v||), so the returned subtree drops into a
    standard checkpoint: bf16 decode runs the QAT'd weights directly and
    ``Int8Decoder`` re-folds/re-quantizes them as usual.
    """
    rates = list(decoder_config["upsample_rates"])
    rks = list(decoder_config["resblock_kernel_sizes"])

    def wn(site, transposed=False):
        w = np.asarray(jax.device_get(folded[site]["w"]), np.float32)
        if transposed:
            norm_axes = (0, 2)
        else:
            norm_axes = tuple(range(w.ndim - 1))
        # flax stores g WITHOUT keepdims (ops/convs.py g_init); _wn_kernel
        # re-broadcasts it over the non-normalized axes
        g = np.sqrt(np.sum(w * w, axis=norm_axes))
        node = {"v": w, "g": np.maximum(g, 1e-12).astype(np.float32)}
        b = folded[site].get("bias")
        if b is not None:
            node["bias"] = np.asarray(jax.device_get(b), np.float32)
        return node

    out = dict(params)
    out["conv_pre"] = wn("conv_pre")
    for i in range(len(rates)):
        out[f"up_{i}"] = wn(f"up_{i}", transposed=True)
        for j in range(len(rks)):
            prefix = f"resblock_{i}_{j}/"
            out[f"resblock_{i}_{j}"] = {
                site[len(prefix):]: wn(site)
                for site in folded
                if site.startswith(prefix)
            }
    out["conv_post"] = wn("conv_post")
    return out


def calibrate_from_folded(folded, feats, decoder_config, smooth_alpha=1.0,
                          headroom: float = 1.1):
    """Serving-equivalent calibration straight from a (possibly QAT'd)
    folded-params pytree: per-site static activation scales + SmoothQuant
    vectors, exactly as ``Int8Decoder.calibrate`` derives them from the
    weight-norm checkpoint. QAT refreshes this every few hundred steps so
    the weights it converges to match the grid a fresh serving
    calibration will build from them (training against a stale grid
    measurably REGRESSES re-calibrated int8 error —
    tests/test_qat_int8.py::test_qat_reduces_true_int8_error)."""
    flat = {
        site: (
            np.asarray(jax.device_get(node["w"]), np.float32),
            None if node.get("bias") is None
            else np.asarray(jax.device_get(node["bias"]), np.float32),
        )
        for site, node in folded.items()
    }
    qparams_base = _quantize_folded(flat, decoder_config)
    amax = _observe_act_amax(qparams_base, [feats], decoder_config)
    smooth = None
    if smooth_alpha is not None:
        smooth = build_smoothing(flat, amax, smooth_alpha)
        amax = {
            site: a / smooth[site] if site in smooth else a
            for site, a in amax.items()
        }
    scales = {
        site: max(float(np.max(a)) * headroom, 1e-8) / 127.0
        for site, a in amax.items()
    }
    return scales, smooth


# ------------------------------------------------------------- fake quant
def _ste(x, q):
    """Straight-through estimator: forward = q, gradient = identity."""
    return x + jax.lax.stop_gradient(q - x)


def fake_quant_weight(w, s_in=None):
    """Per-output-channel symmetric int8 fake-quant of a folded kernel,
    matching ``_quantize_folded_kernel`` bit-for-bit on the forward grid
    (same SmoothQuant multiply, same amax/127 scale, same clip)."""
    if s_in is not None:
        shape = [1] * w.ndim
        shape[-2] = w.shape[-2]
        w = w * jnp.asarray(s_in).reshape(shape)
    axes = tuple(range(w.ndim - 1))
    scale = jnp.max(jnp.abs(w), axis=axes) / 127.0
    scale = jax.lax.stop_gradient(jnp.maximum(scale, 1e-12))
    q = jnp.clip(jnp.round(w / scale), -127.0, 127.0) * scale
    return _ste(w, q)


def fake_quant_act(x, scale, s_in=None):
    """Static per-tensor int8 fake-quant matching ``_ActQuant`` with
    calibrated scales (including the SmoothQuant pre-divide). Returns the
    dequantized activation the serving conv effectively sees."""
    xf = x.astype(jnp.float32)
    if s_in is not None:
        xf = xf / jnp.asarray(s_in)
    # asarray (not the dtype constructor): scales may enter as traced
    # arguments so a calibration refresh doesn't recompile the QAT step
    s = jnp.asarray(scale, jnp.float32)
    q = jnp.clip(jnp.round(xf / s), -127.0, 127.0) * s
    return _ste(xf, q)


def _fq_conv(node, x, padding, dilation, scale, s_in):
    xq = fake_quant_act(x, scale, s_in)
    wq = fake_quant_weight(node["w"], s_in)
    return _conv1d(xq, wq, node.get("bias"), padding=padding, dilation=dilation)


def _fq_conv_transpose(node, x, stride, padding, scale, s_in):
    xq = fake_quant_act(x, scale, s_in)
    wq = fake_quant_weight(node["w"], s_in)
    return _conv_transpose1d(xq, wq, node.get("bias"), stride, padding)


def _lrelu(x, slope=GEN_LRELU):
    return jnp.where(x >= 0, x, slope * x)


def qat_generator_apply(folded, x, decoder_config, act_scales, smooth=None):
    """Differentiable fake-quant twin of ``int8_generator_apply``.

    folded: ``fold_decoder_params`` pytree (the TRAINABLE leaves);
    act_scales: site -> float static scales (from ``Int8Decoder``
    calibration on the pre-QAT weights); smooth: site -> f32 [Cin]
    SmoothQuant vectors (None entries/absence = no fold at that site).
    Returns [B, T * prod(upsample_rates), 1] float32.
    """
    rates = list(decoder_config["upsample_rates"])
    uks = list(decoder_config["upsample_kernel_sizes"])
    rks = list(decoder_config["resblock_kernel_sizes"])
    rds = [list(d) for d in decoder_config["resblock_dilation_sizes"]]
    smooth = smooth or {}

    def s_in(site):
        v = smooth.get(site)
        return None if v is None else jnp.asarray(v)

    x = _fq_conv(folded["conv_pre"], x.astype(jnp.float32), 3, 1,
                 act_scales["conv_pre"], s_in("conv_pre"))
    for i, (u, k) in enumerate(zip(rates, uks)):
        x = _lrelu(x)
        x = _fq_conv_transpose(
            folded[f"up_{i}"], x, u, (k - u) // 2,
            act_scales[f"up_{i}"], s_in(f"up_{i}"),
        )
        acc = None
        for j, rk in enumerate(rks):
            h = x
            for di, d in enumerate(rds[j]):
                site = f"resblock_{i}_{j}/conv1_{di}"
                y = _lrelu(h)
                y = _fq_conv(folded[site], y, (rk - 1) // 2 * d, d,
                             act_scales[site], s_in(site))
                site = f"resblock_{i}_{j}/conv2_{di}"
                y = _lrelu(y)
                y = _fq_conv(folded[site], y, (rk - 1) // 2, 1,
                             act_scales[site], s_in(site))
                h = h + y
            acc = h if acc is None else acc + h
        x = acc / len(rks)
    x = _lrelu(x, 0.01)  # torch default slope (reference generator.py:52)
    node = folded["conv_post"]
    y = _conv1d(x, node["w"], node.get("bias"), padding=3)
    return jnp.tanh(y)
