"""FastSpeech-style multi-stage acoustic predictor (TPU-native).

Re-design of ``acoustic_models/multi_stage_predictor.py:9-126``:
text (phone/tone/er triple embedding) -> encoder FFT blocks -> length
regulation to frame rate -> per-stage decoding coarsest-first, where each
stage conditions on downsampled text plus the repeat-upsampled previous
stage (teacher-forced from the frozen autoencoder's quantizer outputs at
training, auto-regressively from the previous snapped prediction at
inference).

TPU specifics: the length-regulator expansion is the cumsum/gather from
models/transformer.py (no python loops); all stage frame counts are static
(the bucketed pipeline pads frames to a multiple of prod(n_pred_scale));
inference snapping uses the autoencoder codebooks passed in as plain arrays
(the reference wires ``predictor.quantizers = autoencoder.quantizer.quantizer``
at pre_infer, msmc_tts.py:135-152).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from msmctts_tpu.models.quantizer import lookup_codes, nearest_codes
from msmctts_tpu.models.transformer import FFTBlocks, LengthRegulator
from msmctts_tpu.ops.masking import positions_from_lengths
from msmctts_tpu.registry import register_network


def snap_with_codebook(x, embed):
    """Snap [B, T, D] to nearest codewords of embed [H, d, K] (multi-head)."""
    B, T, D = x.shape
    H = embed.shape[0]
    d = D // H
    xh = x.reshape(B, T, H, d)
    idx, _ = nearest_codes(xh, embed)
    return lookup_codes(idx, embed).reshape(B, T, D).astype(x.dtype)


def avg_pool_ceil(x, scale: int):
    if scale == 1:
        return x
    B, T, C = x.shape
    assert T % scale == 0, f"{T} % {scale} != 0"
    return jnp.mean(x.reshape(B, T // scale, scale, C), axis=2)


@register_network("MultiStagePredictor")
@register_network("NASynCascadeFastSpeech")
class MultiStagePredictor(nn.Module):
    n_symbols: Sequence[int]
    n_model_size: int
    n_pred_size: int
    n_pred_scale: Sequence[int]
    encoder_config: dict
    adaptor_config: dict
    decoder_config: dict

    def setup(self):
        syms = self.n_symbols if isinstance(self.n_symbols, (list, tuple)) else [self.n_symbols]
        self.word_embs = [
            nn.Embed(int(n), self.n_model_size, name=f"word_emb_{i}")
            for i, n in enumerate(syms)
        ]
        enc_cfg = dict(self.encoder_config)
        enc_cfg.pop("name", None)
        enc_cfg.setdefault("d_model", self.n_model_size)
        self.encoder = FFTBlocks(name="encoder", **enc_cfg)
        self.upsampler = LengthRegulator(name="upsampler", **dict(self.adaptor_config))

        n_stage = len(self.n_pred_scale)
        # downsamplers iterate fine->coarse (scales reversed, reference
        # multi_stage_predictor.py:30-33)
        self.downsamplers = [
            nn.Conv(
                self.n_model_size,
                (scale * 2 + 1,),
                padding=scale,
                name=f"downsampler_{i}",
            )
            for i, scale in enumerate(self.n_pred_scale[::-1])
        ]
        dec_cfg = dict(self.decoder_config)
        dec_cfg.pop("name", None)
        dec_cfg.setdefault("d_model", self.n_model_size)
        self.dec_pre = [
            nn.Dense(self.n_model_size, name=f"dec_pre_{i}") for i in range(n_stage)
        ]
        self.dec_blocks = [
            FFTBlocks(name=f"dec_blocks_{i}", **dec_cfg) for i in range(n_stage)
        ]
        self.dec_out = [
            nn.Dense(self.n_pred_size, name=f"dec_out_{i}") for i in range(n_stage)
        ]

    def embed_text(self, text):
        """Summed multi-stream embedding with zeroed padding rows
        (multi_stage_predictor.py:17-25,67-70)."""
        if text.ndim == 2:
            text = text[..., None]
        out = None
        for i, emb in enumerate(self.word_embs):
            ids = text[..., i].astype(jnp.int32)
            e = emb(ids) * (ids != 0)[..., None]
            out = e if out is None else out + e
        return out

    def __call__(
        self,
        text,
        text_length,
        dur: Optional[jax.Array] = None,
        feat: Optional[List[jax.Array]] = None,
        feat_length: Optional[List[jax.Array]] = None,
        max_frames: Optional[int] = None,
        codebooks: Optional[List[jax.Array]] = None,
        deterministic: bool = True,
    ):
        """Returns {'feat': coarsest-first predictions, 'feat_length',
        'text_length', 'duration'}.

        Training: pass ``dur`` + teacher ``feat`` (+ per-stage
        ``feat_length``); ``max_frames`` defaults to the teacher's fine
        length. Inference: ``max_frames`` bounds expansion; ``codebooks``
        (coarsest-first [H, d, K] arrays) enable per-stage snapping.
        """
        # Encode
        x = self.embed_text(text)
        pos = positions_from_lengths(text_length, x.shape[1])
        x, text_mask = self.encoder(x, pos, deterministic=deterministic)

        if max_frames is None:
            if feat is not None:
                max_frames = feat[-1].shape[1]
            else:
                raise ValueError("max_frames required when no teacher features given")

        x, total_length, _, duration = self.upsampler(
            x,
            text_mask,
            max_out_len=max_frames,
            target=dur,
            deterministic=deterministic,
        )

        # Per-stage lengths when not provided (ceil-cumulative,
        # multi_stage_predictor.py:48-54)
        if feat_length is None:
            feat_length = []
            total = total_length
            for scale in self.n_pred_scale[::-1]:
                total = jnp.ceil(total / scale).astype(jnp.int32)
                feat_length.append(total)
            feat_length = feat_length[::-1]

        preds = self.decode(
            x, feat, feat_length, codebooks=codebooks, deterministic=deterministic
        )
        return dict(
            feat=preds,
            feat_length=feat_length,
            text_length=text_length,
            duration=duration,
        )

    @staticmethod
    def bias_durations(params, frames_per_symbol: float):
        """Return a copy of ``params`` with the duration head's output bias
        set to ``frames_per_symbol`` — smoke/bench tooling: a freshly
        initialized predictor emits ~0 durations, so synthetic-throughput
        runs would carry no frame load. Located structurally (the unique
        scalar-bias leaf under the DurationPredictor) so module renames
        elsewhere in the tree cannot silently break callers."""
        import flax
        import numpy as np

        flat = flax.traverse_util.flatten_dict(params)
        hits = [
            k
            for k, v in flat.items()
            if any("DurationPredictor" in str(p) for p in k)
            and k[-1] == "bias"
            and getattr(v, "shape", None) == (1,)
        ]
        if len(hits) != 1:
            raise ValueError(f"duration-head bias not uniquely found: {hits}")
        flat = dict(flat)
        flat[hits[0]] = np.asarray([float(frames_per_symbol)], np.float32)
        return flax.traverse_util.unflatten_dict(flat)

    def predict_durations(self, text, text_length):
        """Phase-1 inference: raw (clamped) per-phone duration predictions.

        The host rounds/sums these to pick a static frame bucket before the
        phase-2 synthesis call (reference expands dynamically,
        transformer.py:442-458; a two-phase split keeps XLA shapes static).
        """
        x = self.embed_text(text)
        pos = positions_from_lengths(text_length, x.shape[1])
        x, text_mask = self.encoder(x, pos, deterministic=True)
        _, _, _, dur = self.upsampler(
            x, text_mask, max_out_len=1, target=None, deterministic=True
        )
        return jnp.maximum(dur.astype(jnp.float32), 0.0)

    def decode(self, text_embedding, feat, feat_lengths, codebooks=None, deterministic=True):
        # Downsample the text embedding fine->coarse, collect coarsest-first
        downsampled = []
        h = text_embedding
        for conv, scale in zip(self.downsamplers, self.n_pred_scale[::-1]):
            h = conv(h)
            h = avg_pool_ceil(h, scale)
            downsampled.append(h)
        downsampled = downsampled[::-1]

        preds = []
        output = None
        n_stage = len(self.dec_blocks)
        for i in range(n_stage):
            text_emb = downsampled[i]
            pos = positions_from_lengths(feat_lengths[i], text_emb.shape[1])
            if i > 0:
                scale = self.n_pred_scale[i - 1]
                pre = feat[i - 1] if feat is not None else preds[-1]
                pre = jnp.concatenate([output, pre], axis=-1)
                pre = jnp.repeat(pre, scale, axis=1)[:, : text_emb.shape[1]]
                stage_in = jnp.concatenate([text_emb, pre], axis=-1)
            else:
                stage_in = text_emb
            output = self.dec_pre[i](stage_in)
            output, _ = self.dec_blocks[i](output, pos, deterministic=deterministic)
            prediction = self.dec_out[i](output)
            if codebooks is not None:
                prediction = snap_with_codebook(prediction, codebooks[i])
            preds.append(prediction)
        return preds
