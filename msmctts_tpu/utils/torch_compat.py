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
    # .numpy() SHARES memory with the live tensor: a later in-place update
    # (BatchNorm running stats, EMA codebooks) would silently mutate the
    # converted tree — copy so the conversion is a snapshot.
    return {
        k: v.detach().cpu().numpy().copy() if isinstance(v, torch.Tensor) else np.asarray(v)
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
    (params, codebook, batch_stats) trees for flax MultiStageQuantizer.

    The reference instantiates predictor[0] even though stage 0 never calls
    it (msmc_vqgan.py:163-169); its weights are dropped here. ``norm: True``
    checkpoints carry the preprocessor BatchNorm1d running stats
    (msmc_vqgan.py:115-123, Sequential index 3) into the 'batch_stats'
    collection (TorchBatchNorm); ``batch_stats`` is {} otherwise.
    """
    s = _sub(sd, prefix)
    params, codebook, batch_stats = {}, {}, {}
    for i in _layer_indices(s, r"quantizer\.(\d+)\."):
        codebook[f"vq_{i}"] = quantize(s, f"quantizer.{i}")
        params[f"pre_{i}_a"] = conv1x1_as_dense(s, f"preprocessor.{i}.0")
        params[f"pre_{i}_b"] = conv1x1_as_dense(s, f"preprocessor.{i}.2")
        params[f"post_{i}_a"] = dense(s, f"postprocessor.{i}.0")
        params[f"post_{i}_b"] = dense(s, f"postprocessor.{i}.2")
        if f"preprocessor.{i}.3.running_mean" in s:
            batch_stats[f"prenorm_{i}"] = {
                "mean": s[f"preprocessor.{i}.3.running_mean"],
                "var": s[f"preprocessor.{i}.3.running_var"],
            }
        if i > 0:
            params[f"prior_{i}"] = prior_predictor(s, f"predictor.{i}")
        if any(k.startswith(f"transposed_conv.{i}.") for k in s):
            params[f"up_{i}"] = wn_conv_transpose1d(s, f"transposed_conv.{i}")
    return params, codebook, batch_stats


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


def discriminator_r(sd: StateDict, prefix: str = "") -> dict:
    """Reference DiscriminatorR (discriminator.py:15-76) -> flax
    DiscriminatorR params. The reference wraps each weight-normed conv in an
    nn.Sequential whose conv index is 1 for stage 0 ([pad, conv]) and 2
    otherwise ([lrelu, pad, conv])."""
    s = _sub(sd, prefix)
    params = {}
    for i in _layer_indices(s, r"discriminator\.(\d+)\."):
        ci = 1 if i == 0 else 2
        params[f"conv_{i}"] = wn_conv(s, f"discriminator.{i}.{ci}")
    return params


def discriminator_p(sd: StateDict, prefix: str = "") -> dict:
    """Reference DiscriminatorP (discriminator.py:119-152) -> flax
    DiscriminatorP params."""
    s = _sub(sd, prefix)
    params = {
        f"conv_{i}": wn_conv(s, f"convs.{i}")
        for i in _layer_indices(s, r"convs\.(\d+)\.")
    }
    params["conv_post"] = wn_conv(s, "conv_post")
    return params


def univnet_discriminator(
    sd: StateDict, prefix: str = "", periods=(2, 3, 5, 7, 11)
) -> dict:
    """Reference Discriminator = MRD + MPD (discriminator.py:174-190) ->
    flax UnivNetDiscriminator params. ``periods`` must match the MPD config
    (flax names period discriminators ``disc_p{period}``; torch indexes
    them positionally)."""
    s = _sub(sd, prefix)
    mrd = {}
    for i in _layer_indices(s, r"mrd\.discriminators\.(\d+)\."):
        mrd[f"disc_{i}"] = discriminator_r(s, f"mrd.discriminators.{i}")
    mpd = {}
    for i, p in enumerate(periods):
        mpd[f"disc_p{p}"] = discriminator_p(s, f"mpd.discriminators.{i}")
    return {"mrd": mrd, "mpd": mpd}


# ------------------------------------------------------------------ inverse
# flax -> torch state_dict converters (the exact inverses of the forward
# mappings above). These let a checkpoint TRAINED IN THIS FRAMEWORK be
# loaded into the live reference modules — the basis of the end-to-end
# trained-weights MCD A/B (BASELINE.md "MCD within 1% of the PyTorch
# reference"). All emit {torch_param_name: ndarray}; load with
# ``module.load_state_dict(..., strict=False)`` (frozen sinusoid position
# tables and the reference's never-used stage-0 prior predictor are not
# reconstructed).


def _np(x) -> Array:
    return np.ascontiguousarray(np.asarray(x))


def dense_inv(params: dict, prefix: str) -> StateDict:
    out = {f"{prefix}.weight": _np(params["kernel"]).T}
    if "bias" in params:
        out[f"{prefix}.bias"] = _np(params["bias"])
    return out


def conv1d_inv(params: dict, prefix: str) -> StateDict:
    out = {f"{prefix}.weight": _np(params["kernel"]).transpose(2, 1, 0)}
    if "bias" in params:
        out[f"{prefix}.bias"] = _np(params["bias"])
    return out


def dense_as_conv1x1_inv(params: dict, prefix: str) -> StateDict:
    """flax Dense (NLC 1x1 rewrite) -> nn.Conv1d [out, in, 1]."""
    out = {f"{prefix}.weight": _np(params["kernel"]).T[:, :, None]}
    if "bias" in params:
        out[f"{prefix}.bias"] = _np(params["bias"])
    return out


def wn_conv_inv(params: dict, prefix: str) -> StateDict:
    v = _np(params["v"])
    if v.ndim == 3:  # [k, in, out] -> [out, in, k]
        axes, g_shape = (2, 1, 0), (-1, 1, 1)
    else:  # [kh, kw, in, out] -> [out, in, kh, kw]
        axes, g_shape = (3, 2, 0, 1), (-1, 1, 1, 1)
    out = {
        f"{prefix}.weight_v": v.transpose(axes),
        f"{prefix}.weight_g": _np(params["g"]).reshape(g_shape),
    }
    if "bias" in params:
        out[f"{prefix}.bias"] = _np(params["bias"])
    return out


def wn_conv_transpose1d_inv(params: dict, prefix: str) -> StateDict:
    out = {
        # [k, in, out] -> [in, out, k]
        f"{prefix}.weight_v": _np(params["v"]).transpose(1, 2, 0),
        f"{prefix}.weight_g": _np(params["g"]).reshape(-1, 1, 1),
    }
    if "bias" in params:
        out[f"{prefix}.bias"] = _np(params["bias"])
    return out


def layer_norm_inv(params: dict, prefix: str) -> StateDict:
    return {
        f"{prefix}.weight": _np(params["scale"]),
        f"{prefix}.bias": _np(params["bias"]),
    }


def fft_blocks_inv(params: dict, prefix: str = "") -> StateDict:
    pre = prefix + "." if prefix else ""
    out: StateDict = {}
    for name, block in params.items():
        if not name.startswith("FFTBlock_"):
            continue
        i = int(name.split("_")[-1])
        attn = block["MultiHeadAttention_0"]
        ffn = block["ConvFFN_0"]
        base = f"{pre}layer_stack.{i}"
        out.update(dense_inv(attn["qkv"], f"{base}.slf_attn.linear"))
        out.update(dense_inv(attn["out"], f"{base}.slf_attn.fc"))
        out.update(layer_norm_inv(attn["LayerNorm_0"], f"{base}.slf_attn.layer_norm"))
        out.update(conv1d_inv(ffn["w1"], f"{base}.pos_ffn.w_1"))
        out.update(conv1d_inv(ffn["w2"], f"{base}.pos_ffn.w_2"))
        out.update(layer_norm_inv(ffn["LayerNorm_0"], f"{base}.pos_ffn.layer_norm"))
    return out


def quantize_inv(codebook: dict, prefix: str = "", n_head: Optional[int] = None) -> StateDict:
    """EMAQuantizer codebook [H, d, K] stacks -> Quantize (H==1) or
    MultiHeadQuantize buffer names."""
    pre = prefix + "." if prefix else ""
    embed = _np(codebook["embed"])
    H = embed.shape[0] if n_head is None else n_head
    if H == 1:
        return {
            f"{pre}embed": embed[0],
            f"{pre}cluster_size": _np(codebook["cluster_size"])[0],
            f"{pre}embed_avg": _np(codebook["embed_avg"])[0],
        }
    out: StateDict = {}
    for h in range(H):
        out[f"{pre}quantizers.{h}.embed"] = embed[h]
        out[f"{pre}quantizers.{h}.cluster_size"] = _np(codebook["cluster_size"])[h]
        out[f"{pre}quantizers.{h}.embed_avg"] = _np(codebook["embed_avg"])[h]
    return out


def res_stack_inv(params: dict, prefix: str = "") -> StateDict:
    pre = prefix + "." if prefix else ""
    out: StateDict = {}
    for name, p in params.items():
        if name.startswith("in_"):
            out.update(wn_conv_inv(p, f"{pre}in_layers.{name.split('_')[-1]}"))
        elif name.startswith("res_skip_"):
            out.update(wn_conv_inv(p, f"{pre}res_skip_layers.{name.split('_')[-1]}"))
        elif name == "cond_layer":
            out.update(wn_conv_inv(p, f"{pre}cond_layer"))
    return out


def prior_predictor_inv(params: dict, prefix: str = "") -> StateDict:
    pre = prefix + "." if prefix else ""
    out = res_stack_inv(params["enc"], f"{pre}enc")
    out.update(dense_as_conv1x1_inv(params["proj"], f"{pre}proj"))
    return out


def hifigan_generator_inv(params: dict, prefix: str = "") -> StateDict:
    pre = prefix + "." if prefix else ""
    out = wn_conv_inv(params["conv_pre"], f"{pre}conv_pre")
    out.update(wn_conv_inv(params["conv_post"], f"{pre}conv_post"))
    ups = sorted(
        int(n.split("_")[-1]) for n in params if n.startswith("up_")
    )
    rbs = [n for n in params if n.startswith("resblock_")]
    num_kernels = len(rbs) // max(len(ups), 1)
    for i in ups:
        out.update(wn_conv_transpose1d_inv(params[f"up_{i}"], f"{pre}ups.{i}"))
    for name in rbs:
        _, i, j = name.split("_")
        r = int(i) * num_kernels + int(j)
        block = params[name]
        for m_name, p in block.items():
            kind, m = m_name.rsplit("_", 1)
            tgt = {"conv1": "convs1", "conv2": "convs2", "conv": "convs"}[kind]
            out.update(wn_conv_inv(p, f"{pre}resblocks.{r}.{tgt}.{m}"))
    return out


def multi_stage_quantizer_inv(
    params: dict, codebook: dict, prefix: str = "", batch_stats: Optional[dict] = None
) -> StateDict:
    pre = prefix + "." if prefix else ""
    out: StateDict = {}
    for name in codebook:
        i = int(name.split("_")[-1])
        n_head = _np(codebook[name]["embed"]).shape[0]
        out.update(quantize_inv(codebook[name], f"{pre}quantizer.{i}", n_head))
        out.update(dense_as_conv1x1_inv(params[f"pre_{i}_a"], f"{pre}preprocessor.{i}.0"))
        out.update(dense_as_conv1x1_inv(params[f"pre_{i}_b"], f"{pre}preprocessor.{i}.2"))
        out.update(dense_inv(params[f"post_{i}_a"], f"{pre}postprocessor.{i}.0"))
        out.update(dense_inv(params[f"post_{i}_b"], f"{pre}postprocessor.{i}.2"))
        if f"prior_{i}" in params:
            out.update(prior_predictor_inv(params[f"prior_{i}"], f"{pre}predictor.{i}"))
        if f"up_{i}" in params:
            out.update(
                wn_conv_transpose1d_inv(params[f"up_{i}"], f"{pre}transposed_conv.{i}")
            )
        if batch_stats and f"prenorm_{i}" in batch_stats:
            out[f"{pre}preprocessor.{i}.3.running_mean"] = _np(
                batch_stats[f"prenorm_{i}"]["mean"]
            )
            out[f"{pre}preprocessor.{i}.3.running_var"] = _np(
                batch_stats[f"prenorm_{i}"]["var"]
            )
    return out


def msmc_vqgan_inv(variables: dict, prefix: str = "") -> StateDict:
    """flax MSMCVQGAN variables {'params', 'codebook'[, 'batch_stats']} ->
    reference MSMCVQGAN state_dict names (msmc_vqgan.py:276-409)."""
    pre = prefix + "." if prefix else ""
    params = variables["params"]
    out = dense_inv(params["in_linear"], f"{pre}in_linear")
    for name, block in params["encoder"].items():
        i = int(name.split("_")[-1])
        out.update(fft_blocks_inv(block, f"{pre}encoder.encoders.{i}"))
    out.update(
        multi_stage_quantizer_inv(
            params["quantizer"],
            variables["codebook"]["quantizer"],
            f"{pre}quantizer",
            batch_stats=variables.get("batch_stats", {}).get("quantizer"),
        )
    )
    out.update(hifigan_generator_inv(params["decoder"], f"{pre}decoder"))
    if "frame_decoder" in params:
        out.update(fft_blocks_inv(params["frame_decoder"], f"{pre}frame_decoder"))
    if "mel_predictor" in params:
        out.update(dense_inv(params["mel_predictor"], f"{pre}mel_predictor"))
    return out


def duration_predictor_inv(params: dict, prefix: str = "") -> StateDict:
    pre = prefix + "." if prefix else ""
    out = conv1d_inv(params["conv1"], f"{pre}conv1d_1")
    out.update(layer_norm_inv(params["LayerNorm_0"], f"{pre}layer_norm_1"))
    out.update(conv1d_inv(params["conv2"], f"{pre}conv1d_2"))
    out.update(layer_norm_inv(params["LayerNorm_1"], f"{pre}layer_norm_2"))
    out.update(dense_inv(params["Dense_0"], f"{pre}linear_layer"))
    return out


def multi_stage_predictor_inv(params: dict, prefix: str = "") -> StateDict:
    """flax MultiStagePredictor params -> reference MultiStagePredictor
    state_dict names (multi_stage_predictor.py:9-126)."""
    pre = prefix + "." if prefix else ""
    out: StateDict = {}
    embs = sorted(
        int(n.split("_")[-1]) for n in params if n.startswith("word_emb_")
    )
    if embs == [0]:
        out["word_emb.weight"] = _np(params["word_emb_0"]["embedding"])
    else:
        for i in embs:
            out[f"word_emb.{i}.weight"] = _np(params[f"word_emb_{i}"]["embedding"])
    out.update(fft_blocks_inv(params["encoder"], f"{pre}encoder".strip(".")))
    out.update(
        duration_predictor_inv(
            params["upsampler"]["DurationPredictor_0"],
            f"{pre}upsampler.duration_predictor",
        )
    )
    for name in params:
        if name.startswith("downsampler_"):
            i = int(name.split("_")[-1])
            out.update(conv1d_inv(params[name], f"{pre}downsamplers.{i}"))
        elif name.startswith("dec_pre_"):
            i = int(name.split("_")[-1])
            out.update(dense_inv(params[name], f"{pre}decoders.{i}.0"))
        elif name.startswith("dec_blocks_"):
            i = int(name.split("_")[-1])
            out.update(fft_blocks_inv(params[name], f"{pre}decoders.{i}.1"))
        elif name.startswith("dec_out_"):
            i = int(name.split("_")[-1])
            out.update(dense_inv(params[name], f"{pre}decoders.{i}.2"))
    return out


def msmc_vqgan(sd: StateDict, prefix: str = "") -> dict:
    """Full reference MSMCVQGAN state_dict (msmc_vqgan.py:276-409) ->
    flax variables {'params': ..., 'codebook': ...[, 'batch_stats': ...]}
    for models.MSMCVQGAN."""
    s = _sub(sd, prefix)
    q_params, q_codebook, q_bs = multi_stage_quantizer(s, "quantizer")
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
    out = {"params": params, "codebook": {"quantizer": q_codebook}}
    if q_bs:
        out["batch_stats"] = {"quantizer": q_bs}
    return out
