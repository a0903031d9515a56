"""Reference (PyTorch) checkpoint -> msmctts_tpu parameter conversion.

Lets a user of the reference hhguo/MSMC-TTS transplant trained torch
weights into this framework, and underpins the golden parity tests
(tests/test_reference_parity.py) that prove module-for-module numerical
equivalence with the reference given the same weights.

All converters take a *numpy state dict* — ``{torch_param_name: ndarray}``
— so this module never imports torch; use :func:`state_dict_to_numpy` (which
imports torch lazily) to produce one from a live module or checkpoint.

Layout conventions translated (reference file:line cites):

========================  =============================  =====================
torch                      shape                          flax (here)
==========================================================================
nn.Linear.weight           [out, in]                      Dense kernel [in, out]
nn.Conv1d.weight           [out, in, k]                   Conv kernel [k, in, out]
weight_norm Conv1d         weight_v [out, in, k],         WNConv v [k, in, out],
                           weight_g [out, 1, 1]           g [out]
weight_norm ConvT1d        weight_v [in, out, k],         WNConvTranspose1d
                           weight_g [in, 1, 1]            v [k, in, out], g [in]
nn.LayerNorm               weight/bias [d]                scale/bias [d]
Quantize buffers           embed [d, K] (modules.py:19)   EMAQuantizer codebook
                                                          embed [H, d, K]
==========================================================================
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

Array = np.ndarray
StateDict = Dict[str, Array]


def state_dict_to_numpy(module_or_sd) -> StateDict:
    """torch module / state_dict / checkpoint['model'] -> {name: ndarray}."""
    import torch

    if isinstance(module_or_sd, torch.nn.Module):
        sd = module_or_sd.state_dict()
    else:
        sd = module_or_sd
    return {
        k: v.detach().cpu().numpy() if isinstance(v, torch.Tensor) else np.asarray(v)
        for k, v in sd.items()
    }


def _sub(sd: StateDict, prefix: str) -> StateDict:
    """Strip ``prefix`` (dots included) from matching keys."""
    if prefix and not prefix.endswith("."):
        prefix += "."
    return {k[len(prefix) :]: v for k, v in sd.items() if k.startswith(prefix)}


def _layer_indices(sd: StateDict, pattern: str):
    rx = re.compile(pattern)
    return sorted({int(m.group(1)) for k in sd if (m := rx.match(k))})


def dense(sd: StateDict, prefix: str) -> dict:
    """nn.Linear -> flax Dense."""
    s = _sub(sd, prefix)
    out = {"kernel": np.ascontiguousarray(s["weight"].T)}
    if "bias" in s:
        out["bias"] = s["bias"]
    return out


def conv1d(sd: StateDict, prefix: str) -> dict:
    """nn.Conv1d [out, in, k] -> flax Conv kernel [k, in, out]."""
    s = _sub(sd, prefix)
    out = {"kernel": np.ascontiguousarray(s["weight"].transpose(2, 1, 0))}
    if "bias" in s:
        out["bias"] = s["bias"]
    return out


def conv1x1_as_dense(sd: StateDict, prefix: str) -> dict:
    """1x1 nn.Conv1d -> flax Dense (the NLC rewrite uses Dense for 1x1s)."""
    s = _sub(sd, prefix)
    w = s["weight"]
    assert w.shape[-1] == 1, f"{prefix}: expected k=1, got {w.shape}"
    out = {"kernel": np.ascontiguousarray(w[:, :, 0].T)}
    if "bias" in s:
        out["bias"] = s["bias"]
    return out


def wn_conv(sd: StateDict, prefix: str) -> dict:
    """weight_norm Conv1d/2d -> WNConv {v, g, bias}."""
    s = _sub(sd, prefix)
    v = s["weight_v"]
    axes = tuple(range(v.ndim))[::-1]  # [out, in, k...] -> [k..., in, out]
    if v.ndim == 3:
        axes = (2, 1, 0)
    elif v.ndim == 4:  # conv2d [out, in, kh, kw] -> [kh, kw, in, out]
        axes = (2, 3, 1, 0)
    out = {
        "v": np.ascontiguousarray(v.transpose(axes)),
        "g": s["weight_g"].reshape(-1),
    }
    if "bias" in s:
        out["bias"] = s["bias"]
    return out


def wn_conv_transpose1d(sd: StateDict, prefix: str) -> dict:
    """weight_norm ConvTranspose1d [in, out, k] -> WNConvTranspose1d
    {v [k, in, out], g [in], bias}."""
    s = _sub(sd, prefix)
    out = {
        "v": np.ascontiguousarray(s["weight_v"].transpose(2, 0, 1)),
        "g": s["weight_g"].reshape(-1),
    }
    if "bias" in s:
        out["bias"] = s["bias"]
    return out


def layer_norm(sd: StateDict, prefix: str) -> dict:
    s = _sub(sd, prefix)
    return {"scale": s["weight"], "bias": s["bias"]}


# --------------------------------------------------------------------- blocks


def fft_blocks(sd: StateDict, prefix: str = "") -> dict:
    """Reference FFTBlocks (transformer.py:71-146) -> flax FFTBlocks params.

    The frozen sinusoid position table ('position.weight') is not a
    parameter here (recomputed constant) and is skipped.
    """
    s = _sub(sd, prefix)
    params = {}
    for i in _layer_indices(s, r"layer_stack\.(\d+)\."):
        ls = _sub(s, f"layer_stack.{i}")
        params[f"FFTBlock_{i}"] = {
            "MultiHeadAttention_0": {
                "qkv": dense(ls, "slf_attn.linear"),
                "out": dense(ls, "slf_attn.fc"),
                "LayerNorm_0": layer_norm(ls, "slf_attn.layer_norm"),
            },
            "ConvFFN_0": {
                "w1": conv1d(ls, "pos_ffn.w_1"),
                "w2": conv1d(ls, "pos_ffn.w_2"),
                "LayerNorm_0": layer_norm(ls, "pos_ffn.layer_norm"),
            },
        }
    return params


def quantize(sd: StateDict, prefix: str = "") -> dict:
    """Reference Quantize / MultiHeadQuantize buffers (modules.py:19-22,
    133-136) -> EMAQuantizer 'codebook' collection entries."""
    s = _sub(sd, prefix)
    if "embed" in s:  # single-head Quantize
        heads = [s]
    else:
        heads = [
            _sub(s, f"quantizers.{h}")
            for h in _layer_indices(s, r"quantizers\.(\d+)\.")
        ]
    return {
        "embed": np.stack([h["embed"] for h in heads]),  # [H, d, K]
        "cluster_size": np.stack([h["cluster_size"] for h in heads]),  # [H, K]
        "embed_avg": np.stack([h["embed_avg"] for h in heads]),
    }


def res_stack(sd: StateDict, prefix: str = "") -> dict:
    """Reference ResStack (modules.py:182-259) -> flax ResStack params."""
    s = _sub(sd, prefix)
    params = {}
    for i in _layer_indices(s, r"in_layers\.(\d+)\."):
        params[f"in_{i}"] = wn_conv(s, f"in_layers.{i}")
    for i in _layer_indices(s, r"res_skip_layers\.(\d+)\."):
        params[f"res_skip_{i}"] = wn_conv(s, f"res_skip_layers.{i}")
    if any(k.startswith("cond_layer.") for k in s):
        params["cond_layer"] = wn_conv(s, "cond_layer")
    return params


def prior_predictor(sd: StateDict, prefix: str = "") -> dict:
    """Reference PriorPredictor (msmc_vqgan.py:65-88)."""
    s = _sub(sd, prefix)
    return {"enc": res_stack(s, "enc"), "proj": conv1x1_as_dense(s, "proj")}


def hifigan_generator(sd: StateDict, prefix: str = "") -> dict:
    """Reference HiFi-GAN Generator (hifigan/generator.py:10-64)."""
    s = _sub(sd, prefix)
    params = {
        "conv_pre": wn_conv(s, "conv_pre"),
        "conv_post": wn_conv(s, "conv_post"),
    }
    ups = _layer_indices(s, r"ups\.(\d+)\.")
    for i in ups:
        params[f"up_{i}"] = wn_conv_transpose1d(s, f"ups.{i}")
    resblocks = _layer_indices(s, r"resblocks\.(\d+)\.")
    num_kernels = len(resblocks) // max(len(ups), 1)
    for r in resblocks:
        i, j = divmod(r, num_kernels)
        rs = _sub(s, f"resblocks.{r}")
        block = {}
        for m in _layer_indices(rs, r"convs1\.(\d+)\."):
            block[f"conv1_{m}"] = wn_conv(rs, f"convs1.{m}")
        for m in _layer_indices(rs, r"convs2\.(\d+)\."):
            block[f"conv2_{m}"] = wn_conv(rs, f"convs2.{m}")
        # ResBlock2 stores its convs under 'convs.'
        for m in _layer_indices(rs, r"convs\.(\d+)\."):
            block[f"conv_{m}"] = wn_conv(rs, f"convs.{m}")
        params[f"resblock_{i}_{j}"] = block
    return params


def multi_stage_quantizer(sd: StateDict, prefix: str = ""):
    """Reference MultiStageQuantizer (msmc_vqgan.py:91-273) ->
    (params, codebook) trees for flax MultiStageQuantizer.

    The reference instantiates predictor[0] even though stage 0 never calls
    it (msmc_vqgan.py:163-169); its weights are dropped here.
    """
    s = _sub(sd, prefix)
    if any(".running_mean" in k for k in s):
        raise NotImplementedError(
            "norm=True (BatchNorm preprocessor) checkpoints are not supported"
            " — no shipped recipe uses norm=True"
        )
    params, codebook = {}, {}
    for i in _layer_indices(s, r"quantizer\.(\d+)\."):
        codebook[f"vq_{i}"] = quantize(s, f"quantizer.{i}")
        params[f"pre_{i}_a"] = conv1x1_as_dense(s, f"preprocessor.{i}.0")
        params[f"pre_{i}_b"] = conv1x1_as_dense(s, f"preprocessor.{i}.2")
        params[f"post_{i}_a"] = dense(s, f"postprocessor.{i}.0")
        params[f"post_{i}_b"] = dense(s, f"postprocessor.{i}.2")
        if i > 0:
            params[f"prior_{i}"] = prior_predictor(s, f"predictor.{i}")
        if any(k.startswith(f"transposed_conv.{i}.") for k in s):
            params[f"up_{i}"] = wn_conv_transpose1d(s, f"transposed_conv.{i}")
    return params, codebook


def duration_predictor(sd: StateDict, prefix: str = "") -> dict:
    """Reference DurationPredictor (transformer.py:481-534) -> flax
    DurationPredictor params."""
    s = _sub(sd, prefix)
    return {
        "conv1": conv1d(s, "conv1d_1"),
        "LayerNorm_0": layer_norm(s, "layer_norm_1"),
        "conv2": conv1d(s, "conv1d_2"),
        "LayerNorm_1": layer_norm(s, "layer_norm_2"),
        "Dense_0": dense(s, "linear_layer"),
    }


def length_regulator(sd: StateDict, prefix: str = "") -> dict:
    """Reference LengthRegulator (transformer.py:427-478)."""
    s = _sub(sd, prefix)
    return {"DurationPredictor_0": duration_predictor(s, "duration_predictor")}


def multi_stage_predictor(sd: StateDict, prefix: str = "") -> dict:
    """Reference MultiStagePredictor (multi_stage_predictor.py:9-126) ->
    flax MultiStagePredictor params."""
    s = _sub(sd, prefix)
    params = {
        "encoder": fft_blocks(s, "encoder"),
        "upsampler": length_regulator(s, "upsampler"),
    }
    if "word_emb.weight" in s:
        params["word_emb_0"] = {"embedding": s["word_emb.weight"]}
    else:
        for i in _layer_indices(s, r"word_emb\.(\d+)\."):
            params[f"word_emb_{i}"] = {"embedding": s[f"word_emb.{i}.weight"]}
    for i in _layer_indices(s, r"downsamplers\.(\d+)\."):
        params[f"downsampler_{i}"] = conv1d(s, f"downsamplers.{i}")
    for i in _layer_indices(s, r"decoders\.(\d+)\."):
        params[f"dec_pre_{i}"] = dense(s, f"decoders.{i}.0")
        params[f"dec_blocks_{i}"] = fft_blocks(s, f"decoders.{i}.1")
        params[f"dec_out_{i}"] = dense(s, f"decoders.{i}.2")
    return params


def msmc_vqgan(sd: StateDict, prefix: str = "") -> dict:
    """Full reference MSMCVQGAN state_dict (msmc_vqgan.py:276-409) ->
    flax variables {'params': ..., 'codebook': ...} for models.MSMCVQGAN."""
    s = _sub(sd, prefix)
    q_params, q_codebook = multi_stage_quantizer(s, "quantizer")
    params = {
        "in_linear": dense(s, "in_linear"),
        "quantizer": q_params,
        "decoder": hifigan_generator(s, "decoder"),
    }
    encoder = {}
    for i in _layer_indices(s, r"encoder\.encoders\.(\d+)\."):
        encoder[f"encoder_{i}"] = fft_blocks(s, f"encoder.encoders.{i}")
    params["encoder"] = encoder
    if any(k.startswith("frame_decoder.") for k in s):
        params["frame_decoder"] = fft_blocks(s, "frame_decoder")
    if any(k.startswith("mel_predictor.") for k in s):
        params["mel_predictor"] = dense(s, "mel_predictor")
    return {"params": params, "codebook": {"quantizer": q_codebook}}
