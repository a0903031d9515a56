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
  ``HifiGANGenerator.__call__`` with every hot conv computed as an XLA
  NATIVE int8 convolution (``lax.conv_general_dilated`` with
  ``preferred_element_type=int32`` — dilated and lhs-dilated/transposed
  forms included): activations are dynamically quantized per tensor
  (amax/127), accumulation is exact int32, and dequantization + bias +
  leaky_relu fuse into the surrounding elementwise ops. ``conv_post``
  (k=7, C_in=32 -> 1) stays in float: it is negligible compute and feeds
  tanh directly, where the last fraction of a percent of quantization
  noise would land unfiltered on the waveform.

Numerics: int32 accumulation makes the int8 convs EXACT for int8 inputs
(tests/test_int8_generator.py asserts bit-parity against the float conv
on the same integer operands); end-to-end error vs the fp32 generator
comes only from the activation/weight rounding itself. Per-tensor
activation rounding is the dominant error term on trained weights
(rel-L2 0.049 acts-only vs 0.003 weights-only, r4 attribution), so
``Int8Decoder`` applies a SmoothQuant fold (arXiv:2211.10438) at
calibration: per-input-channel activation ranges migrate into the
per-output-channel-quantized kernels (``s_in`` vectors in the qparams),
cutting end-to-end rel-L2 3.6x (0.064 -> 0.018 at alpha=1) for one
fused constant-vector multiply per site. Inference-only — no VJP is
defined or needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from msmctts_tpu.ops.fused_generator import _conv1d, _conv_transpose1d, _fold

GEN_LRELU = 0.1


# --------------------------------------------------------------- weights
def _fold_generator_params(params: dict, decoder_config: dict) -> dict:
    """Fold weight norm for every generator conv. Returns a FLAT dict
    ``site -> (w f32 numpy [k.., in, out], bias f32 numpy | None)`` with
    the same site names ``_ActQuant`` uses (``conv_pre``, ``up_{i}``,
    ``resblock_{i}_{j}/conv1_{d}``, ..., ``conv_post``)."""
    rates = list(decoder_config["upsample_rates"])
    rks = list(decoder_config["resblock_kernel_sizes"])

    def fold(p, transposed=False):
        w, b = _fold(p, transposed=transposed)
        return (
            np.asarray(jax.device_get(w), np.float32),
            None if b is None else np.asarray(jax.device_get(b), np.float32),
        )

    folded = {"conv_pre": fold(params["conv_pre"])}
    for i in range(len(rates)):
        folded[f"up_{i}"] = fold(params[f"up_{i}"], transposed=True)
        for j in range(len(rks)):
            rb = params[f"resblock_{i}_{j}"]
            for name in rb:
                folded[f"resblock_{i}_{j}/{name}"] = fold(rb[name])
    folded["conv_post"] = fold(params["conv_post"])
    return folded


def _quantize_folded_kernel(w, b, s_in=None) -> dict:
    """Folded float kernel -> {w_q int8, scale f32 [out], bias, s_in?}.

    ``s_in`` (f32 [in]) is a SmoothQuant fold (arXiv:2211.10438): the
    input-channel axis of the kernel absorbs the activation's per-channel
    dynamic range (``w * s_in``) while the activation is divided by the
    same vector before quantization — the float product is unchanged, but
    per-tensor activation rounding stops being dominated by a few hot
    channels."""
    if s_in is not None:
        shape = [1] * w.ndim
        shape[-2] = w.shape[-2]
        w = w * np.asarray(s_in, np.float32).reshape(shape)
    axes = tuple(range(w.ndim - 1))  # all but out-channel
    scale = np.max(np.abs(w), axis=axes) / 127.0
    scale = np.maximum(scale, 1e-12).astype(np.float32)
    w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    node = {"w_q": w_q, "scale": scale}
    if b is not None:
        node["bias"] = b
    if s_in is not None:
        node["s_in"] = np.asarray(s_in, np.float32)
    return node


def _is_float_site(site: str, float_sites) -> bool:
    return any(site == p or site.startswith(p) for p in float_sites)


def _quantize_folded(
    folded: dict, decoder_config: dict, smooth=None, float_sites=()
) -> dict:
    """Flat folded-float dict -> the nested qparams pytree
    ``int8_generator_apply`` consumes. ``smooth``: optional
    ``site -> f32 [in]`` SmoothQuant vectors (``conv_post`` ignored).
    ``float_sites``: site-name prefixes kept as folded FLOAT kernels
    (mixed-precision fallback, e.g. ``("up_0", "resblock_0_")`` keeps the
    first upsample stage in bf16 while the narrow bandwidth-bound tail
    stays int8)."""
    smooth = smooth or {}
    rates = list(decoder_config["upsample_rates"])
    rks = list(decoder_config["resblock_kernel_sizes"])

    def q(site):
        w, b = folded[site]
        if _is_float_site(site, float_sites):
            return {"w": w, "bias": b}
        return _quantize_folded_kernel(w, b, smooth.get(site))

    out = {"conv_pre": q("conv_pre")}
    for i in range(len(rates)):
        out[f"up_{i}"] = q(f"up_{i}")
        for j in range(len(rks)):
            prefix = f"resblock_{i}_{j}/"
            out[f"resblock_{i}_{j}"] = {
                site[len(prefix):]: q(site)
                for site in folded
                if site.startswith(prefix)
            }
    w, b = folded["conv_post"]
    out["conv_post"] = {"w": w, "bias": b}
    return out


def quantize_generator_params(
    params: dict, decoder_config: dict, smooth=None, float_sites=()
) -> dict:
    """Quantize a trained HifiGANGenerator params subtree for int8 serving.

    Host-side, once per checkpoint. Returns a pytree of numpy leaves
    (int8 kernels + f32 scales/biases, plus per-site ``s_in`` SmoothQuant
    vectors when ``smooth`` is given); ``conv_post`` (and any
    ``float_sites`` match) keeps its folded float kernel.
    """
    return _quantize_folded(
        _fold_generator_params(params, decoder_config), decoder_config,
        smooth, float_sites,
    )


def build_smoothing(folded: dict, act_amax: dict, alpha: float) -> dict:
    """SmoothQuant migration vectors: ``s_c = a_c^alpha / w_c^(1-alpha)``
    per input channel (a_c = calibrated activation |max|, w_c = kernel
    |max| over that input channel), geometric-mean normalized so the
    overall scale level is untouched. alpha=1 is pure activation
    equalization — measured best on trained CSMSC weights (rel-L2 0.018
    vs 0.064 plain int8; per-tensor activation rounding is the dominant
    error term, weights are per-channel and absorb the fold for free)."""
    smooth = {}
    for site, a_c in act_amax.items():
        if site == "conv_post" or site not in folded:
            continue
        w, _ = folded[site]
        w_c = np.max(
            np.abs(w), axis=(0,) + tuple(range(2, w.ndim))
        )  # per input channel
        a_c = np.maximum(np.asarray(a_c, np.float32), 1e-5)
        s = (a_c ** alpha) / (np.maximum(w_c, 1e-5) ** (1.0 - alpha))
        s = s / np.exp(np.mean(np.log(np.maximum(s, 1e-8))))
        smooth[site] = np.maximum(s, 1e-3).astype(np.float32)
    return smooth


# ------------------------------------------------------------ int8 compute
def _quant_act(x):
    """Dynamic per-tensor symmetric int8: returns (q int8, scale f32[])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def int8_conv1d(xq, w_q, padding: int, dilation: int = 1):
    """1-D s8 x s8 -> s32 conv via XLA's native int8 convolution.

    xq [B, T, Cin] int8, w_q [k, Cin, Cout] int8. XLA lowers this straight
    onto the MXU's int8 path with its usual conv tiling/fusion — measured
    1.1-1.9x the bf16 conv at generator stage shapes on v5e (the earlier
    per-tap dot_general decomposition materialized k int32 intermediates
    per conv and ran 4x SLOWER than bf16; kept only in the tests as the
    exactness reference).
    """
    return jax.lax.conv_general_dilated(
        xq,
        w_q,
        window_strides=(1,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.int32,
    )


def int8_conv_transpose1d(xq, w_q, stride: int, padding: int):
    """Torch-semantics transposed conv in int8: lhs-dilated correlation
    with a tap-flipped kernel (same formulation as ops/convs.
    WNConvTranspose1d), s8 x s8 -> s32 on the MXU. Requires
    k - stride == 2*padding so out_len == T*stride exactly (true of every
    HiFi-GAN recipe here: k=[12,11,11,4], u=[6,5,5,2])."""
    k = w_q.shape[0]
    u, p = stride, padding
    assert k - u == 2 * p, (k, u, p)
    return jax.lax.conv_general_dilated(
        xq,
        jnp.flip(w_q, axis=0),
        window_strides=(1,),
        padding=[(k - 1 - p, k - 1 - p)],
        lhs_dilation=(u,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.int32,
    )


class _ActQuant:
    """Per-conv-site activation quantizer.

    Three modes: dynamic per-tensor amax (default — no calibration data
    needed, but each site pays a full reduction that serializes against
    the conv), static calibrated scales (``scales``: site -> python
    float; the scale becomes a compile-time constant, so quant fuses into
    the preceding lrelu and dequant into the conv epilogue), and
    observation (``observe`` dict collects per-site amax for
    ``calibrate_act_scales``).
    """

    def __init__(self, scales=None, observe=None):
        self.scales = scales
        self.observe = observe

    def __call__(self, x, site: str, s_in=None):
        xf = x.astype(jnp.float32)
        if s_in is not None:
            # SmoothQuant: divide per input channel before rounding; the
            # kernel's matching multiply makes the float product exact.
            # Fuses into the preceding lrelu (constant-vector multiply).
            xf = xf / jnp.asarray(s_in)
        if self.scales is not None:
            s = jnp.float32(self.scales[site])
        else:
            amax_c = jnp.max(jnp.abs(xf), axis=tuple(range(xf.ndim - 1)))
            if self.observe is not None:
                # per-input-channel amax: feeds both the per-tensor static
                # scale (its max) and the SmoothQuant fold
                self.observe[site] = amax_c
            s = jnp.maximum(jnp.max(amax_c), 1e-8) / 127.0
        q = jnp.clip(jnp.round(xf / s), -127.0, 127.0).astype(jnp.int8)
        return q, s


def _dequant(y_i32, s_x, node, dtype):
    y = y_i32.astype(jnp.float32) * (s_x * jnp.asarray(node["scale"]))
    if node.get("bias") is not None:
        y = y + jnp.asarray(node["bias"])
    return y.astype(dtype)


def _lrelu(x, slope=GEN_LRELU):
    return jnp.where(x >= 0, x, slope * x)


def _site_conv(node, x, padding, dilation, dtype, aq, site):
    """One conv site: int8 (quantize-conv-dequant) or the float fallback
    when the node carries a float kernel (``float_sites``)."""
    if "w" in node:
        y = _conv1d(
            x.astype(dtype), jnp.asarray(node["w"]).astype(dtype),
            None if node["bias"] is None else jnp.asarray(node["bias"]).astype(dtype),
            padding=padding, dilation=dilation,
        )
        return y.astype(dtype)
    q, s = aq(x, site, node.get("s_in"))
    return _dequant(
        int8_conv1d(q, jnp.asarray(node["w_q"]), padding, dilation),
        s, node, dtype,
    )


def _resblock_i8(qp, x, kernel_size, dilations, dtype, aq, site):
    for i, d in enumerate(dilations):
        h = _lrelu(x)
        h = _site_conv(
            qp[f"conv1_{i}"], h, (kernel_size - 1) // 2 * d, d, dtype, aq,
            f"{site}/conv1_{i}",
        )
        h = _lrelu(h)
        h = _site_conv(
            qp[f"conv2_{i}"], h, (kernel_size - 1) // 2, 1, dtype, aq,
            f"{site}/conv2_{i}",
        )
        x = x + h
    return x


def int8_generator_apply(
    qparams, x, decoder_config, dtype=jnp.bfloat16, act_scales=None,
    _observe=None,
):
    """Quantized twin of HifiGANGenerator.__call__ / fused_generator_apply.

    qparams: output of ``quantize_generator_params``; x [B, T, num_mels]
    float; returns [B, T * prod(upsample_rates), 1] in ``dtype``.
    ``act_scales`` (site -> float, from ``calibrate_act_scales``) switches
    activation quantization from dynamic per-tensor amax to static
    compile-time scales — the fast serving configuration.
    """
    rates = list(decoder_config["upsample_rates"])
    uks = list(decoder_config["upsample_kernel_sizes"])
    rks = list(decoder_config["resblock_kernel_sizes"])
    rds = [list(d) for d in decoder_config["resblock_dilation_sizes"]]
    aq = _ActQuant(scales=act_scales, observe=_observe)

    x = _site_conv(qparams["conv_pre"], x, 3, 1, dtype, aq, "conv_pre")
    for i, (u, k) in enumerate(zip(rates, uks)):
        x = _lrelu(x)
        node = qparams[f"up_{i}"]
        if "w" in node:
            x = _conv_transpose1d(
                x.astype(dtype), jnp.asarray(node["w"]).astype(dtype),
                None if node["bias"] is None
                else jnp.asarray(node["bias"]).astype(dtype),
                u, (k - u) // 2,
            ).astype(dtype)
        else:
            q, s = aq(x, f"up_{i}", node.get("s_in"))
            x = _dequant(
                int8_conv_transpose1d(q, jnp.asarray(node["w_q"]), u, (k - u) // 2),
                s, node, dtype,
            )
        acc = None
        for j, rk in enumerate(rks):
            r = _resblock_i8(
                qparams[f"resblock_{i}_{j}"], x, rk, rds[j], dtype, aq,
                f"resblock_{i}_{j}",
            )
            acc = r if acc is None else acc + r
        x = acc / len(rks)
    # final activation: torch default slope 0.01 (reference generator.py:52)
    x = _lrelu(x, 0.01)
    node = qparams["conv_post"]
    bias = None if node["bias"] is None else jnp.asarray(node["bias"])
    y = _conv1d(x.astype(jnp.float32), jnp.asarray(node["w"]), bias, padding=3)
    return jnp.tanh(y).astype(dtype)


class Int8Decoder:
    """Serving wrapper: quantized kernels + lazily calibrated scales.

    Built once from a trained ``HifiGANGenerator`` params subtree (e.g.
    ``variables['params']['decoder']`` of an MSMCVQGAN checkpoint — bf16
    casts are fine, folding runs in fp32). ``calibrate(feats)`` observes
    per-site per-input-channel amax on representative decoder inputs
    (typically the first inference batch), applies the SmoothQuant fold
    (``smooth_alpha``; None disables), and freezes static per-tensor
    scales with ``headroom`` margin; ``apply(feats)`` is then
    jit-composable (static scales close over the trace; ``qparams`` ride
    along as ordinary arguments). ``float_sites`` keeps matching sites in
    float (mixed-precision fallback; measured NOT to improve trained-
    weights AS-MCD — the residual int8 error is distributed rounding
    noise, see ab_int8_r4.json — but kept as the escape hatch for models
    where it does).
    """

    def __init__(self, decoder_params, decoder_config, headroom: float = 1.1,
                 dtype=jnp.bfloat16, smooth_alpha: Optional[float] = 1.0,
                 float_sites=()):
        self.decoder_config = {
            k: (list(v) if isinstance(v, (list, tuple)) else v)
            for k, v in dict(decoder_config).items()
        }
        # numpy (host) leaves on purpose: closed-over DEVICE buffers would
        # force a D2H fetch mid-trace when this rides inside a jit (the
        # round-2 bench-gate failure mode); host arrays embed for free
        self._folded = _fold_generator_params(decoder_params, self.decoder_config)
        self.float_sites = tuple(float_sites)
        # unsmoothed quantization: the observation graph for calibrate()
        # (re-calibration must always see RAW activation ranges) and the
        # serving qparams until/unless calibrate applies the fold
        self._qparams_base = _quantize_folded(
            self._folded, self.decoder_config, float_sites=self.float_sites
        )
        self.qparams = self._qparams_base
        self.headroom = float(headroom)
        self.dtype = dtype
        self.smooth_alpha = smooth_alpha
        self.scales: Optional[dict] = None

    def calibrate(self, feats) -> None:
        amax = _observe_act_amax(self._qparams_base, [feats], self.decoder_config)
        if self.smooth_alpha is not None:
            smooth = build_smoothing(self._folded, amax, self.smooth_alpha)
            self.qparams = _quantize_folded(
                self._folded, self.decoder_config, smooth,
                float_sites=self.float_sites,
            )
            # post-fold per-tensor amax is exactly max_c(a_c / s_c)
            amax = {
                site: a / smooth[site] if site in smooth else a
                for site, a in amax.items()
            }
        self.scales = {
            site: max(float(np.max(a)) * self.headroom, 1e-8) / 127.0
            for site, a in amax.items()
        }

    def apply(self, feats):
        """[B, T, C] decoder inputs -> [B, T*ratio, 1]; requires
        ``calibrate`` first (raises otherwise — dynamic scales would
        silently forfeit the speedup)."""
        if self.scales is None:
            raise RuntimeError("Int8Decoder.calibrate(feats) must run first")
        return int8_generator_apply(
            self.qparams, feats, self.decoder_config, dtype=self.dtype,
            act_scales=self.scales,
        )


def _observe_act_amax(qparams, batches, decoder_config) -> dict:
    """Run representative inputs through the dynamic-quant graph and
    return per-site per-input-channel |max| vectors (numpy f32 [Cin]),
    max-merged over batches. One jitted call per batch shape."""

    @jax.jit
    def observe(x):
        obs: dict = {}
        int8_generator_apply(qparams, x, decoder_config, _observe=obs)
        return obs

    merged: dict = {}
    for x in batches:
        obs = jax.device_get(observe(x))
        for site, amax_c in obs.items():
            amax_c = np.asarray(amax_c, np.float32)
            prev = merged.get(site)
            merged[site] = amax_c if prev is None else np.maximum(prev, amax_c)
    return merged


def calibrate_act_scales(
    qparams, batches, decoder_config, headroom: float = 1.0
) -> dict:
    """Static per-site per-tensor scales: max over batches of per-site
    amax, times ``headroom``, divided by 127. If ``qparams`` carries a
    SmoothQuant fold the observation already sees smoothed activations,
    so the scales are correct either way."""
    merged = _observe_act_amax(qparams, batches, decoder_config)
    return {
        site: max(float(np.max(amax_c)) * headroom, 1e-8) / 127.0
        for site, amax_c in merged.items()
    }
