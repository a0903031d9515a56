"""MSMC-VQ-GAN autoencoder (TPU-native).

Re-design of the reference ``vqgantts/msmc_vqgan.py``:

  * ``MultiStageEncoder`` (msmc_vqgan.py:14-62): FFT-block stack per stage
    with average-pool downsampling between stages. Static shapes: the input
    frame count must be a multiple of prod(downsample_scales) (the bucketed
    data pipeline guarantees this), so pooling is exact and the
    repeat-upsample chain realigns without dynamic crops.
  * ``MultiStageQuantizer`` (msmc_vqgan.py:91-273): coarsest-first residual
    VQ chain — prior predictor, 1x1 preprocessor, fused multi-head EMA
    quantizer, postprocessor, residual accumulation, repeat upsampling.
  * ``MSMCVQGAN`` (msmc_vqgan.py:276-409): in_linear -> encoder ->
    quantizer -> optional FFT frame decoder -> optional mel head ->
    HiFi-GAN decoder, with per-utterance window crops done via a vmapped
    ``dynamic_slice`` instead of a python loop (msmc_vqgan.py:344-346).

All methods are pure; EMA codebook updates occur only when the caller makes
the 'codebook' collection mutable.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from msmctts_tpu.models.hifigan import HifiGANGenerator
from msmctts_tpu.models.modules import PriorPredictor
from msmctts_tpu.models.quantizer import EMAQuantizer
from msmctts_tpu.models.transformer import FFTBlocks
from msmctts_tpu.ops.masking import positions_from_lengths, sequence_mask
from msmctts_tpu.registry import register_network


def avg_pool_1d(x, scale: int):
    """Exact average pooling over time ([B, T, C], T % scale == 0)."""
    if scale == 1:
        return x
    B, T, C = x.shape
    assert T % scale == 0, f"frame count {T} not divisible by pool scale {scale}"
    return jnp.mean(x.reshape(B, T // scale, scale, C), axis=2)


def repeat_upsample(x, scale: int):
    """repeat_interleave along time ([B, T, C] -> [B, T*scale, C])."""
    if scale == 1:
        return x
    return jnp.repeat(x, scale, axis=1)


class MultiStageEncoder(nn.Module):
    """Per-stage FFT blocks with pool-by-scale between stages; returns
    fine-to-coarse [(feat, length)] like the reference."""

    in_channels: int
    downsample_scales: Sequence[int] = (1,)
    max_seq_len: int = 2400
    n_layers: int = 4
    n_head: int = 2
    d_k: int = 64
    d_v: int = 64
    d_inner: int = 1024
    fft_conv1d_kernel: int = 3
    fft_conv1d_padding: int = 1
    dropout: float = 0.2
    attn_dropout: float = 0.1
    fused_layernorm: bool = False

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool = True):
        outputs = []
        feat, feat_length = x, lengths
        for i, scale in enumerate(self.downsample_scales):
            if scale > 1:
                feat = avg_pool_1d(feat, scale)
                feat_length = jnp.ceil(feat_length / scale).astype(jnp.int32)
            pos = positions_from_lengths(feat_length, feat.shape[1])
            feat, _ = FFTBlocks(
                max_seq_len=self.max_seq_len,
                n_layers=self.n_layers,
                n_head=self.n_head,
                d_k=self.d_k,
                d_v=self.d_v,
                d_model=self.in_channels,
                d_inner=self.d_inner,
                fft_conv1d_kernel=self.fft_conv1d_kernel,
                dropout=self.dropout,
                attn_dropout=self.attn_dropout,
                name=f"encoder_{i}",
            )(feat, pos, deterministic=deterministic)
            outputs.append((feat, feat_length))
        return outputs


class MultiStageQuantizer(nn.Module):
    """Coarsest-first residual multi-stage multi-head quantization.

    ``upsample_scales`` is the reference's ``downsample_scales`` reversed
    (msmc_vqgan.py:292-294). All three upsampling modes are implemented:
    'repeat' (repeat_interleave, the mode every shipped recipe uses),
    'mapping' (transposed conv), and 'residual' (repeat + dropout(transposed))
    — reference msmc_vqgan.py:138-144,204-215; see test_upsampling_modes.py.
    """

    n_model_size: int
    upsample_scales: Sequence[int]
    embedding_sizes: Any = 512
    embedding_dims: Any = 256
    n_heads: int = 4
    prior_config: Optional[dict] = None
    norm: bool = False
    upsampling: str = "repeat"
    dropout: float = 0.1
    update_codebook: bool = True
    restart_dead: float = 0.0  # dead-codeword restart threshold (see EMAQuantizer)
    use_pallas: Any = "auto"  # fused Pallas VQ kernel routing (see EMAQuantizer)

    def setup(self):
        if self.upsampling not in ("repeat", "mapping", "residual"):
            raise ValueError(f"unknown upsampling '{self.upsampling}'")
        n_stage = len(self.upsample_scales)
        sizes = self.embedding_sizes
        dims = self.embedding_dims
        self._sizes = sizes if isinstance(sizes, (list, tuple)) else [sizes] * n_stage
        self._dims = dims if isinstance(dims, (list, tuple)) else [dims] * n_stage

        priors, pres, quants, posts = [], [], [], []
        prior_cfg = dict(self.prior_config or {})
        for i in range(n_stage):
            emb_dim = self._dims[i]
            if i > 0:  # prior predictor is unused at the coarsest stage
                priors.append(
                    PriorPredictor(
                        in_channels=self.n_model_size,
                        out_channels=emb_dim,
                        name=f"prior_{i}",
                        **prior_cfg,
                    )
                )
            else:
                priors.append(None)
            pre = [nn.Dense(emb_dim, name=f"pre_{i}_a")]
            pre.append(nn.Dense(emb_dim, name=f"pre_{i}_b"))
            pres.append(pre)
            quants.append(
                EMAQuantizer(
                    embed_dim=emb_dim,
                    n_embed=self._sizes[i],
                    n_head=self.n_heads,
                    restart_dead=self.restart_dead,
                    use_pallas=self.use_pallas,
                    name=f"vq_{i}",
                )
            )
            posts.append(
                [
                    nn.Dense(emb_dim, name=f"post_{i}_a"),
                    nn.Dense(self.n_model_size, name=f"post_{i}_b"),
                ]
            )
        self.priors = priors
        self.pres = pres
        self.quants = quants
        self.posts = posts
        if self.upsampling != "repeat":
            # learned transposed-conv upsamplers (msmc_vqgan.py:138-144:
            # k = 2u (even u) else 2u+1, pad (k-u)//2); torch-exact output
            # lengths via WNConvTranspose1d's lhs-dilated formulation
            from msmctts_tpu.ops.convs import WNConvTranspose1d

            ups = []
            for i, u in enumerate(self.upsample_scales):
                k = u * 2 if u % 2 == 0 else u * 2 + 1
                ups.append(
                    WNConvTranspose1d(
                        self.n_model_size, k, u, (k - u) // 2, name=f"up_{i}"
                    )
                )
            self.ups = ups
        if self.norm:
            # torch-parity BatchNorm1d(affine=False): tracked running stats
            # used at eval (reference msmc_vqgan.py:115-123); see
            # models.modules.TorchBatchNorm
            from msmctts_tpu.models.modules import TorchBatchNorm

            self.norms = [
                TorchBatchNorm(name=f"prenorm_{i}") for i in range(n_stage)
            ]

    def _dropout(self, x, deterministic):
        if deterministic or self.dropout == 0.0:
            return x
        keep = 1.0 - self.dropout
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)

    def __call__(
        self,
        stages: List[Tuple[Optional[jax.Array], jax.Array]],
        from_encoder: bool = True,
        deterministic: bool = True,
    ):
        """stages: [(embedding|None, length)] — fine-to-coarse when
        ``from_encoder`` (reversed internally, msmc_vqgan.py:153-154),
        coarsest-first otherwise. Returns the reference's output dict with
        coarsest-first per-stage lists."""
        if from_encoder:
            stages = stages[::-1]

        quant_outputs, quant_diffs, quant_indices = [], [], []
        pred_states = []
        lengths_out = []
        residual = None

        for i, (embedding, length) in enumerate(stages):
            T = embedding.shape[1] if embedding is not None else residual.shape[1]
            mask = sequence_mask(length, T, dtype=jnp.float32)[..., None]
            lengths_out.append(length)

            # Prior prediction from the running residual
            pred_quant = None
            if residual is not None:
                pred_hidden, pred_quant = self.priors[i](
                    residual, mask, deterministic=deterministic
                )
                residual = residual + self._dropout(pred_hidden, deterministic)

            # Pre-quantization projection
            if embedding is None:
                q_input = pred_quant
            elif from_encoder:
                pre_in = (
                    jnp.concatenate([embedding, residual], axis=-1)
                    if residual is not None
                    else embedding
                )
                h = self.pres[i][0](pre_in)
                h = jnp.tanh(h)
                h = self.pres[i][1](h)
                if self.norm:
                    h = self.norms[i](h, use_running_average=deterministic)
                q_input = h
            else:
                q_input = embedding

            quant, diff, indices = self.quants[i](
                q_input, lengths=length, update=self.update_codebook
            )

            # Post-quantization projection + residual accumulation
            post_in = quant if residual is None else jnp.concatenate([residual, quant], axis=-1)
            h = self.posts[i][0](post_in)
            h = jnp.tanh(h)
            h = self.posts[i][1](h)
            h = self._dropout(h, deterministic)
            residual = h if residual is None else residual + h

            quant_outputs.append(quant)
            quant_diffs.append(diff)
            quant_indices.append(indices)
            pred_states.append(
                dict(
                    predictor_outputs=pred_quant,
                    target_outputs=quant,
                    target_indices=indices,
                    target_lengths=length,
                )
            )

            u = self.upsample_scales[i]
            if self.upsampling == "repeat":
                residual = repeat_upsample(residual, u)
            elif self.upsampling == "mapping":
                residual = self.ups[i](residual)
            else:  # 'residual': repeat + dropout(transposed) (msmc_vqgan.py:207-212)
                t = self.ups[i](residual)
                residual = repeat_upsample(residual, u) + self._dropout(
                    t, deterministic
                )

        out = dict(
            residual_output=residual,
            quantizer_outputs=quant_outputs,
            quantizer_diffs=quant_diffs,
            quantizer_indices=quant_indices,
            quantizer_lengths=lengths_out,
        )
        if not deterministic:
            out["predictor_diffs"] = self.compute_embedding_loss(
                pred_states, methods=["mse"], loss_weights=[1.0]
            )
        return out

    def snap(self, stage: int, x):
        """Nearest-codeword snap for stage ``stage`` (predictor inference)."""
        return self.quants[stage].quantize(x)

    def compute_embedding_loss(
        self, pred_states, methods=("mse",), loss_weights=(1.0,)
    ):
        """Per-stage, per-method masked embedding losses
        (msmc_vqgan.py:236-273). Returns a dict with 'total_loss'."""
        loss_dict = {"total_loss": jnp.zeros((), jnp.float32)}
        for i, state in enumerate(pred_states):
            p = state["predictor_outputs"]
            if p is None:
                continue
            weights = loss_weights
            if isinstance(loss_weights[0], (list, tuple)):
                weights = loss_weights[i]
            length = state["target_lengths"]
            T = p.shape[1]
            mask = sequence_mask(length, T, dtype=jnp.float32)
            denom = jnp.maximum(jnp.sum(length.astype(jnp.float32)), 1.0)

            for method, weight in zip(methods, weights):
                if method == "mse":
                    t = jax.lax.stop_gradient(state["target_outputs"])
                    loss = jnp.mean(jnp.square(p - t), axis=-1)  # [B, T]
                elif method == "softmax":
                    t = jax.lax.stop_gradient(state["target_indices"])
                    if t.ndim == 3:
                        t = t[..., 0]
                    logp = jax.nn.log_softmax(p, axis=-1)
                    loss = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
                elif method in ("triple", "triple_mean"):
                    loss = self.quants[i].compute_triple_loss(
                        p, state["target_indices"], reduction="mean"
                    )
                elif method == "triple_sum":
                    loss = self.quants[i].compute_triple_loss(
                        p, state["target_indices"], reduction="sum"
                    )
                else:
                    raise ValueError(f"unknown embedding loss '{method}'")
                loss = jnp.sum(loss * mask) / denom
                loss_dict[f"embed_loss_{method}_{i}"] = loss
                loss_dict["total_loss"] = loss_dict["total_loss"] + loss * weight
        return loss_dict


@register_network("MSMCVQGAN")
class MSMCVQGAN(nn.Module):
    """The v2 autoencoder (msmc_vqgan.py:276-409)."""

    in_dim: int
    n_model_size: int
    encoder_config: Optional[dict] = None
    quantizer_config: Optional[dict] = None
    frame_decoder_config: Optional[dict] = None
    decoder_config: Optional[dict] = None
    pred_mel: bool = False

    def setup(self):
        enc_cfg = dict(self.encoder_config or {})
        self.in_linear = nn.Dense(self.n_model_size)
        self.encoder = MultiStageEncoder(in_channels=self.n_model_size, **enc_cfg)
        self.quantizer = MultiStageQuantizer(
            n_model_size=self.n_model_size,
            upsample_scales=list(enc_cfg.get("downsample_scales", [1]))[::-1],
            **(self.quantizer_config or {}),
        )
        dec_cfg = dict(self.decoder_config or {})
        dec_cfg["num_mels"] = self.n_model_size
        # decoder family is selectable (``decoder_config._name``): the
        # reference is HiFi-GAN-only; ISTFTGenerator is the TPU-first
        # fast-decode variant (models/hifigan.py)
        dec_name = dec_cfg.pop("_name", "HifiGANGenerator")
        from msmctts_tpu.registry import get_network

        self.decoder = get_network(dec_name)(**dec_cfg)
        if self.frame_decoder_config is not None:
            self.frame_decoder = FFTBlocks(
                d_model=self.n_model_size, **dict(self.frame_decoder_config)
            )
        if self.pred_mel:
            self.mel_predictor = nn.Dense(self.in_dim)

    @property
    def frameshift_ratio(self) -> int:
        from msmctts_tpu.models.hifigan import generator_upsample_ratio

        return generator_upsample_ratio(self.decoder_config)

    def _frame_decode(self, decoder_inputs, lengths, deterministic):
        if self.frame_decoder_config is None:
            return decoder_inputs
        pos = positions_from_lengths(lengths, decoder_inputs.shape[1])
        out, _ = self.frame_decoder(decoder_inputs, pos, deterministic=deterministic)
        return out

    def __call__(
        self,
        mel,
        mel_length,
        warmup: bool = False,
        window_starts: Optional[jax.Array] = None,
        window_frames: Optional[int] = None,
        deterministic: bool = True,
    ):
        """Training/e2e forward. ``window_starts`` [B] frame offsets +
        static ``window_frames`` crop the decoder input per utterance before
        waveform generation (reference msmc_vqgan.py:342-348)."""
        out = {}
        x = self.in_linear(mel)
        encoder_states = self.encoder(x, mel_length, deterministic=deterministic)
        q = self.quantizer(encoder_states, deterministic=deterministic)
        decoder_inputs = q["residual_output"]

        enc_feats = [s[0] for s in encoder_states]
        enc_lens = [s[1] for s in encoder_states]
        out.update(
            encoder_outputs=enc_feats[::-1],
            encoder_lengths=enc_lens[::-1],
            encoder_indices=q["quantizer_indices"],
            encoder_diffs=q["quantizer_diffs"],
            decoder_diffs=q.get("predictor_diffs"),
        )

        decoder_inputs = self._frame_decode(decoder_inputs, mel_length, deterministic)
        if self.pred_mel:
            out["mel_outputs"] = self.mel_predictor(decoder_inputs)

        if not warmup:
            if window_starts is not None:
                assert window_frames is not None
                decoder_inputs = jax.vmap(
                    lambda seq, s: jax.lax.dynamic_slice(
                        seq, (s, 0), (window_frames, seq.shape[-1])
                    )
                )(decoder_inputs, window_starts)
            out["decoder_outputs"] = self.decoder(decoder_inputs)
        return out

    def encode_features(self, mel, mel_length, deterministic: bool = True):
        """``__call__``'s analysis-synthesis path up to (excluding) the
        HiFi-GAN decoder, no window: encoder, quantizer, frame decoder.
        Serving hook for the int8 decoder (ops/int8_generator.py)."""
        x = self.in_linear(mel)
        encoder_states = self.encoder(x, mel_length, deterministic=deterministic)
        q = self.quantizer(encoder_states, deterministic=deterministic)
        return self._frame_decode(q["residual_output"], mel_length, deterministic)

    def analysis(self, mel, mel_length, deterministic: bool = True):
        """mel -> quantizer states (msmc_vqgan.py:352-370)."""
        x = self.in_linear(mel)
        encoder_states = self.encoder(x, mel_length, deterministic=deterministic)
        q = self.quantizer(encoder_states, deterministic=deterministic)
        if not deterministic:
            enc_feats = [s[0] for s in encoder_states]
            enc_lens = [s[1] for s in encoder_states]
            return dict(
                encoder_outputs=enc_feats[::-1],
                encoder_lengths=enc_lens[::-1],
                encoder_indices=q["quantizer_indices"],
                encoder_diffs=q["quantizer_diffs"],
                decoder_diffs=q.get("predictor_diffs"),
                quantizer_states=q,
            )
        return q

    def synthesis_features(
        self, quantizer_outputs, quantizer_lengths, deterministic: bool = True
    ):
        """Everything in ``synthesis`` up to (excluding) the HiFi-GAN
        decoder: nearest-codeword re-quantization, residual chain, frame
        decoder. Serving hook: the int8 decoder path
        (ops/int8_generator.py) consumes these features."""
        stages = list(zip(quantizer_outputs, quantizer_lengths))
        q = self.quantizer(stages, from_encoder=False, deterministic=deterministic)
        decoder_inputs = q["residual_output"]
        return self._frame_decode(
            decoder_inputs, quantizer_lengths[-1], deterministic
        )

    def synthesis(self, quantizer_outputs, quantizer_lengths, deterministic: bool = True):
        """Predicted embeddings (coarsest-first) -> waveform
        (msmc_vqgan.py:372-398): re-quantize via nearest codewords, run the
        residual chain, frame decoder, HiFi-GAN."""
        return self.decoder(
            self.synthesis_features(
                quantizer_outputs, quantizer_lengths, deterministic=deterministic
            )
        )

    def compute_embedding_loss(
        self,
        quantizer_outputs,
        quantizer_lengths,
        quantizer_states,
        methods=("mse",),
        loss_weights=(1.0,),
    ):
        """Adapt predictor outputs into the quantizer's loss API
        (msmc_vqgan.py:401-409)."""
        pred_states = [
            dict(
                predictor_outputs=quantizer_outputs[i],
                target_outputs=quantizer_states["quantizer_outputs"][i],
                target_indices=quantizer_states["quantizer_indices"][i],
                target_lengths=quantizer_lengths[i],
            )
            for i in range(len(quantizer_outputs))
        ]
        return self.quantizer.compute_embedding_loss(pred_states, methods, loss_weights)

    def snap(self, stage: int, x):
        return self.quantizer.snap(stage, x)
