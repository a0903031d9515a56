"""QS-TTS embedding-input VQ-GAN family (TPU/JAX).

Reconstructed from the reference ``vqgantts/msmc_vqgan_emb.py`` (broken at
reference HEAD — missing ``msmc_vqgan_speech`` superset module, SURVEY.md
2.3; the working spec is the class bodies themselves):

  * ``MAMSEncoder`` (msmc_vqgan_emb.py:40-120): per-stage FFT blocks over
    SSL embeddings with a conv pitch/energy encoder added AFTER each stage's
    transformer; content representations tapped at stage 0 pre-pitch.
  * ``MSMCVQGANEmb`` (msmc_vqgan_emb.py:123-291): in_linear -> MAMS ->
    MultiStageQuantizer -> optional ECAPA-TDNN global speaker embedding
    added to decoder inputs -> frame decoder -> mel predictor (mel_dim may
    differ from the input dim) -> HiFi-GAN; window supports per-utterance
    starts and (i, s) sub-batch selection (msmc_vqgan_emb.py:214-219).
  * ``AttrPredictor`` (msmc_vqgan_emb.py:14-37): ResStack + 1x1 head for
    the adversarial prosody estimator.
  * ``KMeansQuantizer`` / ``KMeansVQGANEmb`` (msmc_vqgan_emb.py:294-469):
    frozen k-means centroids as a single no-update codebook.
  * ``EmbVC`` (msmc_vqgan_emb.py:472-628): continuous-bottleneck voice
    conversion (no quantizer in forward).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from msmctts_tpu.models.hifigan import HifiGANGenerator
from msmctts_tpu.models.modules import ResStack
from msmctts_tpu.models.msmc_vqgan import MultiStageQuantizer, avg_pool_1d
from msmctts_tpu.models.quantizer import lookup_codes, nearest_codes
from msmctts_tpu.models.tdnn import ECAPA_TDNN
from msmctts_tpu.models.transformer import FFTBlocks
from msmctts_tpu.ops.masking import positions_from_lengths, sequence_mask
from msmctts_tpu.registry import register_network


def load_kmeans_centroids(path: str) -> np.ndarray:
    """[K, dim] centroids from a sklearn-KMeans pickle or a raw .npy
    (reference loads the sklearn object, msmc_vqgan_emb.py:296-301)."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    import pickle

    with open(path, "rb") as f:
        model = pickle.load(f)
    centers = getattr(model, "cluster_centers_", model)
    return np.asarray(centers, np.float32)


@register_network("AttrPredictor")
class AttrPredictor(nn.Module):
    """ResStack + 1x1 head predicting frame-level attributes (pitch/energy)
    from hidden states; used adversarially by the Emb trainer."""

    in_channels: int
    out_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool = True):
        mask = sequence_mask(lengths, x.shape[1], dtype=x.dtype)[..., None]
        h = ResStack(
            hidden_channels=self.in_channels,
            kernel_size=self.kernel_size,
            dilation_rate=self.dilation_rate,
            n_layers=self.n_layers,
            name="enc",
        )(x, mask, deterministic=deterministic)
        o = nn.Dense(self.out_channels, name="proj")(h) * mask
        return h, o


class PitchEncoder(nn.Module):
    """conv7-tanh-conv3-tanh-conv3-tanh-conv1 over [pitch; energy]
    (msmc_vqgan_emb.py:76-85)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (7,), padding=3, name="c0")(x)
        h = jnp.tanh(h)
        h = nn.Conv(self.channels, (3,), padding=1, name="c1")(h)
        h = jnp.tanh(h)
        h = nn.Conv(self.channels, (3,), padding=1, name="c2")(h)
        h = jnp.tanh(h)
        return nn.Conv(self.channels, (1,), name="c3")(h)


class MAMSEncoder(nn.Module):
    """Multi-attribute multi-stage encoder. Returns (stages fine-to-coarse,
    content representations)."""

    in_channels: int
    pitch_dim: int = 1
    energy_dim: int = 1
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
    def __call__(self, emb, input_length, pitch=None, energy=None, deterministic=True):
        use_pitch = self.pitch_dim + self.energy_dim > 0 and pitch is not None
        if use_pitch:
            pe = jnp.concatenate([pitch, energy], axis=-1)
            pitch_encoding = PitchEncoder(self.in_channels, name="pitch_encoder")(pe)

        outputs, content = [], None
        feat, feat_length = emb, input_length
        for i, scale in enumerate(self.downsample_scales):
            if scale > 1:
                feat = avg_pool_1d(feat, scale)
                if use_pitch:
                    pitch_encoding = avg_pool_1d(pitch_encoding, scale)
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
            if i == 0:
                content = feat  # pre-pitch content representations
            if use_pitch:
                feat = feat + pitch_encoding
            outputs.append((feat, feat_length))
        return outputs, content


class _EmbDecoderMixin:
    """Shared decoder tail: global embedding add, frame decoder, mel head,
    windowed HiFi-GAN decode."""

    def _global_embed(self, ref, train):
        if getattr(self, "global_encoder", None) is None:
            return None
        return self.global_encoder(ref, train=train)[:, None, :]

    def _decode_tail(
        self,
        out,
        decoder_inputs,
        lengths,
        ref,
        window_starts,
        window_frames,
        window_indices,
        decode,
        deterministic,
    ):
        if getattr(self, "frame_decoder", None) is not None:
            pos = positions_from_lengths(lengths, decoder_inputs.shape[1])
            decoder_inputs, _ = self.frame_decoder(
                decoder_inputs, pos, deterministic=deterministic
            )
        if getattr(self, "mel_predictor", None) is not None:
            out["mel_outputs"] = self.mel_predictor(decoder_inputs)
        if decode:
            if window_starts is not None:
                if window_indices is not None:
                    # (i, s) sub-batch windows (msmc_vqgan_emb.py:214-219)
                    decoder_inputs = decoder_inputs[window_indices]
                decoder_inputs = jax.vmap(
                    lambda seq, s: jax.lax.dynamic_slice(
                        seq, (s, 0), (window_frames, seq.shape[-1])
                    )
                )(decoder_inputs, window_starts)
            out["decoder_outputs"] = self.decoder(decoder_inputs)
        return out


@register_network("MSMCVQGANEmb")
class MSMCVQGANEmb(nn.Module, _EmbDecoderMixin):
    emb_dim: int
    n_model_size: int
    pitch_dim: int = 1
    energy_dim: int = 1
    encoder_config: Optional[dict] = None
    quantizer_config: Optional[dict] = None
    global_encoder_config: Optional[dict] = None
    frame_decoder_config: Optional[dict] = None
    decoder_config: Optional[dict] = None
    pred_mel: bool = False
    mel_dim: Optional[int] = None

    def setup(self):
        enc_cfg = dict(self.encoder_config or {})
        self.in_linear = nn.Dense(self.n_model_size)
        self.encoder = MAMSEncoder(
            in_channels=self.n_model_size,
            pitch_dim=self.pitch_dim,
            energy_dim=self.energy_dim,
            **enc_cfg,
        )
        if self.global_encoder_config is not None:
            name = self.global_encoder_config.get("_name", "ECAPA_TDNN")
            if name != "ECAPA_TDNN":
                raise ValueError(f"unknown global encoder {name}")
            self.global_encoder = ECAPA_TDNN(
                in_channels=self.mel_dim or self.emb_dim,
                embd_dim=self.n_model_size,
                channels=self.n_model_size,
            )
        else:
            self.global_encoder = None
        self.quantizer = MultiStageQuantizer(
            n_model_size=self.n_model_size,
            upsample_scales=list(enc_cfg.get("downsample_scales", [1]))[::-1],
            **(self.quantizer_config or {}),
        )
        dec_cfg = dict(self.decoder_config or {})
        dec_cfg["num_mels"] = self.n_model_size
        self.decoder = HifiGANGenerator(**dec_cfg)
        if self.frame_decoder_config is not None:
            self.frame_decoder = FFTBlocks(
                d_model=self.n_model_size, **dict(self.frame_decoder_config)
            )
        else:
            self.frame_decoder = None
        if self.pred_mel:
            self.mel_predictor = nn.Dense(self.mel_dim or self.emb_dim)
        else:
            self.mel_predictor = None

    def __call__(
        self,
        emb,
        emb_length,
        pitch=None,
        energy=None,
        mel=None,
        ref=None,
        decode: bool = True,
        window_starts=None,
        window_frames: Optional[int] = None,
        window_indices=None,
        deterministic: bool = True,
    ):
        out = {}
        x = self.in_linear(emb)
        encoder_states, content = self.encoder(
            x, emb_length, pitch, energy, deterministic=deterministic
        )
        enc_feats = [s[0] for s in encoder_states]
        enc_lens = [s[1] for s in encoder_states]
        out["encoder_outputs"] = enc_feats[::-1]
        out["encoder_lengths"] = enc_lens[::-1]
        out["content_representations"] = content

        q = self.quantizer(encoder_states, deterministic=deterministic)
        decoder_inputs = q["residual_output"]
        out["encoder_indices"] = q["quantizer_indices"]
        out["encoder_diffs"] = q["quantizer_diffs"]
        out["decoder_diffs"] = q.get("predictor_diffs")

        g = self._global_embed(mel if ref is None else ref, not deterministic)
        if g is not None:
            decoder_inputs = decoder_inputs + g
        return self._decode_tail(
            out,
            decoder_inputs,
            emb_length,
            ref,
            window_starts,
            window_frames,
            window_indices,
            decode,
            deterministic,
        )

    def analysis(self, emb, emb_length, pitch=None, energy=None, deterministic=True):
        x = self.in_linear(emb)
        encoder_states, content = self.encoder(
            x, emb_length, pitch, energy, deterministic=deterministic
        )
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
                content_representations=content,
            )
        return q

    def synthesis(self, quantizer_outputs, quantizer_lengths, ref=None, deterministic=True):
        stages = list(zip(quantizer_outputs, quantizer_lengths))
        q = self.quantizer(stages, from_encoder=False, deterministic=deterministic)
        decoder_inputs = q["residual_output"]
        g = self._global_embed(ref, False) if ref is not None else None
        if g is not None:
            decoder_inputs = decoder_inputs + g
        out = self._decode_tail(
            {}, decoder_inputs, quantizer_lengths[-1], ref, None, None, None, True,
            deterministic,
        )
        return out["decoder_outputs"]

    def compute_embedding_loss(
        self, quantizer_outputs, quantizer_lengths, quantizer_states,
        methods=("mse",), loss_weights=(1.0,),
    ):
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


class KMeansQuantizer(nn.Module):
    """Frozen single-codebook quantizer from k-means centroids. Codewords
    live in the 'codebook' collection (never updated)."""

    model_path: str

    def setup(self):
        centroids = load_kmeans_centroids(self.model_path)  # [K, d]
        self.embed = self.variable(
            "codebook",
            "embed",
            lambda: jnp.asarray(centroids.T[None], jnp.float32),  # [1, d, K]
        )

    def __call__(self, stages: List[Tuple[jax.Array, jax.Array]], from_encoder=True):
        quant_outputs, quant_diffs, quant_indices, lengths = [], [], [], []
        for embedding, length in stages:
            B, T, D = embedding.shape
            xh = embedding.reshape(B, T, 1, D)
            idx, _ = nearest_codes(xh, self.embed.value)
            quant = lookup_codes(idx, self.embed.value).reshape(B, T, D)
            diff = jnp.square(jax.lax.stop_gradient(quant) - embedding)
            quant = embedding + jax.lax.stop_gradient(quant - embedding)
            quant_outputs.append(quant)
            quant_diffs.append(diff)
            quant_indices.append(idx[..., 0])
            lengths.append(length)
        return dict(
            residual_output=None,
            quantizer_outputs=quant_outputs,
            quantizer_diffs=quant_diffs,
            quantizer_indices=quant_indices,
            quantizer_lengths=lengths,
            predictor_diffs=None,
        )


@register_network("KMeansVQGANEmb")
class KMeansVQGANEmb(nn.Module, _EmbDecoderMixin):
    """Decoder-only VQGAN around frozen k-means codewords
    (msmc_vqgan_emb.py:341-469)."""

    emb_dim: int
    n_model_size: int
    quantizer_path: str = ""
    global_encoder_config: Optional[dict] = None
    frame_decoder_config: Optional[dict] = None
    decoder_config: Optional[dict] = None
    pred_mel: bool = False
    mel_dim: Optional[int] = None

    def setup(self):
        self.quantizer = KMeansQuantizer(self.quantizer_path)
        self.in_linear = nn.Dense(self.n_model_size)
        if self.global_encoder_config is not None:
            self.global_encoder = ECAPA_TDNN(
                in_channels=self.mel_dim or self.emb_dim,
                embd_dim=self.n_model_size,
                channels=self.n_model_size,
            )
        else:
            self.global_encoder = None
        dec_cfg = dict(self.decoder_config or {})
        dec_cfg["num_mels"] = self.n_model_size
        self.decoder = HifiGANGenerator(**dec_cfg)
        if self.frame_decoder_config is not None:
            self.frame_decoder = FFTBlocks(
                d_model=self.n_model_size, **dict(self.frame_decoder_config)
            )
        else:
            self.frame_decoder = None
        if self.pred_mel:
            self.mel_predictor = nn.Dense(self.mel_dim or self.emb_dim)
        else:
            self.mel_predictor = None

    def __call__(
        self,
        emb,
        emb_length,
        pitch=None,
        energy=None,
        mel=None,
        ref=None,
        decode: bool = True,
        window_starts=None,
        window_frames: Optional[int] = None,
        window_indices=None,
        deterministic: bool = True,
    ):
        out = {}
        q = self.quantizer([(emb, emb_length)])
        decoder_inputs = self.in_linear(q["quantizer_outputs"][-1])
        out["encoder_indices"] = q["quantizer_indices"]
        g = self._global_embed(mel if ref is None else ref, not deterministic)
        if g is not None:
            decoder_inputs = decoder_inputs + g
        return self._decode_tail(
            out, decoder_inputs, emb_length, ref, window_starts, window_frames,
            window_indices, decode, deterministic,
        )

    def analysis(self, emb, emb_length, deterministic=True):
        return self.quantizer([(emb, emb_length)])

    def synthesis(self, quantizer_outputs, quantizer_lengths, ref=None, deterministic=True):
        q = self.quantizer(list(zip(quantizer_outputs, quantizer_lengths)))
        decoder_inputs = self.in_linear(q["quantizer_outputs"][-1])
        g = self._global_embed(ref, False) if ref is not None else None
        if g is not None:
            decoder_inputs = decoder_inputs + g
        out = self._decode_tail(
            {}, decoder_inputs, quantizer_lengths[-1], ref, None, None, None, True,
            deterministic,
        )
        return out["decoder_outputs"]


@register_network("EmbVC")
class EmbVC(nn.Module, _EmbDecoderMixin):
    """Voice conversion: continuous bottleneck (finest encoder output), no
    quantizer in forward (msmc_vqgan_emb.py:472-628)."""

    emb_dim: int
    n_model_size: int
    pitch_dim: int = 1
    energy_dim: int = 1
    encoder_config: Optional[dict] = None
    global_encoder_config: Optional[dict] = None
    frame_decoder_config: Optional[dict] = None
    decoder_config: Optional[dict] = None
    pred_mel: bool = False
    mel_dim: Optional[int] = None

    def setup(self):
        enc_cfg = dict(self.encoder_config or {})
        self.in_linear = nn.Dense(self.n_model_size)
        self.encoder = MAMSEncoder(
            in_channels=self.n_model_size,
            pitch_dim=self.pitch_dim,
            energy_dim=self.energy_dim,
            **enc_cfg,
        )
        if self.global_encoder_config is not None:
            self.global_encoder = ECAPA_TDNN(
                in_channels=self.mel_dim or self.emb_dim,
                embd_dim=self.n_model_size,
                channels=self.n_model_size,
            )
        else:
            self.global_encoder = None
        dec_cfg = dict(self.decoder_config or {})
        dec_cfg["num_mels"] = self.n_model_size
        self.decoder = HifiGANGenerator(**dec_cfg)
        if self.frame_decoder_config is not None:
            self.frame_decoder = FFTBlocks(
                d_model=self.n_model_size, **dict(self.frame_decoder_config)
            )
        else:
            self.frame_decoder = None
        if self.pred_mel:
            self.mel_predictor = nn.Dense(self.mel_dim or self.emb_dim)
        else:
            self.mel_predictor = None

    def __call__(
        self,
        emb,
        emb_length,
        pitch=None,
        energy=None,
        mel=None,
        ref=None,
        decode: bool = True,
        window_starts=None,
        window_frames: Optional[int] = None,
        window_indices=None,
        deterministic: bool = True,
    ):
        out = {}
        x = self.in_linear(emb)
        encoder_states, content = self.encoder(
            x, emb_length, pitch, energy, deterministic=deterministic
        )
        enc_feats = [s[0] for s in encoder_states]
        enc_lens = [s[1] for s in encoder_states]
        out["encoder_outputs"] = enc_feats[::-1]
        out["encoder_lengths"] = enc_lens[::-1]
        out["content_representations"] = content
        decoder_inputs = enc_feats[-1]
        g = self._global_embed(mel if ref is None else ref, not deterministic)
        if g is not None:
            decoder_inputs = decoder_inputs + g
        return self._decode_tail(
            out, decoder_inputs, emb_length, ref, window_starts, window_frames,
            window_indices, decode, deterministic,
        )
