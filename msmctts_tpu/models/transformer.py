"""FastSpeech-style transformer blocks (TPU/JAX).

Re-design of the reference's ``acoustic_models/transformer.py``:
  * FFTBlocks (transformer.py:71-146): frozen sinusoid position table with
    padding_idx 0, fused-QKV self-attention (transformer.py:222-256),
    conv1d FFN (transformer.py:330-385), non-pad masking after each
    sublayer.
  * LengthRegulator (transformer.py:427-478): the reference expands phones
    with a *per-utterance Python loop* of ``repeat_interleave`` (flagged
    "TODO: parallelize"); here it is a static-shape cumsum + searchsorted
    gather that XLA compiles to one batched take.
  * DurationPredictor (transformer.py:481-534).

All ops are static-shape; attention is expressed as einsums that tile onto
the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LAYERNORM_EPS = 1e-5  # torch nn.LayerNorm default
NEG_INF = -1e9  # finite mask fill: safe under bf16, exact enough post-softmax


@functools.lru_cache(maxsize=None)
def sinusoid_position_table(n_position: int, d_hid: int) -> np.ndarray:
    """Sinusoid table [n_position, d_hid]; row 0 zeroed (padding_idx).

    Matches reference transformer.py:388-407: angle(pos, j) =
    pos / 10000^(2*(j//2)/d_hid), sin at even dims, cos at odd dims.
    """
    position = np.arange(n_position, dtype=np.float64)[:, None]
    dim = np.arange(d_hid, dtype=np.float64)[None, :]
    angle = position / np.power(10000.0, 2.0 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    table[0] = 0.0
    return table.astype(np.float32)


class MultiHeadAttention(nn.Module):
    """Fused-QKV self-attention with key-padding mask + residual + LN."""

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float
    attn_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, key_pad, deterministic: bool = True):
        B, T, _ = x.shape
        d_out = 2 * self.d_k + self.d_v
        qkv = nn.Dense(
            self.n_head * d_out,
            kernel_init=nn.initializers.xavier_normal(),
            name="qkv",
        )(x)
        qkv = qkv.reshape(B, T, self.n_head, d_out)
        q = qkv[..., : self.d_k]
        k = qkv[..., self.d_k : 2 * self.d_k]
        v = qkv[..., 2 * self.d_k :]

        scale = 1.0 / np.sqrt(self.d_k)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = jnp.where(key_pad[:, None, None, :], NEG_INF, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_dropout)(attn, deterministic=deterministic)

        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(B, T, self.n_head * self.d_v)
        out = nn.Dense(
            self.d_model,
            kernel_init=nn.initializers.xavier_normal(),
            name="out",
        )(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = out + x
        return nn.LayerNorm(epsilon=LAYERNORM_EPS)(out)


class ConvFFN(nn.Module):
    """conv1d(k) -> relu -> conv1d(k) -> dropout -> residual -> LN."""

    d_model: int
    d_inner: int
    kernel_size: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Conv(self.d_inner, (self.kernel_size,), padding="SAME", name="w1")(x)
        h = jax.nn.relu(h)
        h = nn.Conv(self.d_model, (self.kernel_size,), padding="SAME", name="w2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = h + x
        return nn.LayerNorm(epsilon=LAYERNORM_EPS)(h)


class FFTBlock(nn.Module):
    d_model: int
    d_inner: int
    n_head: int
    d_k: int
    d_v: int
    kernel_size: int = 3
    dropout: float = 0.1
    attn_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, key_pad, non_pad, deterministic: bool = True):
        x = MultiHeadAttention(
            n_head=self.n_head,
            d_model=self.d_model,
            d_k=self.d_k,
            d_v=self.d_v,
            dropout=self.dropout,
            attn_dropout=self.attn_dropout,
        )(x, key_pad, deterministic)
        x = x * non_pad
        x = ConvFFN(
            d_model=self.d_model,
            d_inner=self.d_inner,
            kernel_size=self.kernel_size,
            dropout=self.dropout,
        )(x, deterministic)
        return x * non_pad


class FFTBlocks(nn.Module):
    """N FFT blocks over [B, T, d_model] with 1-based position ids
    (0 = padding). Accepts extra config keys the reference carries
    (``fft_conv1d_padding``, ``name``, ``fused_layernorm``) for YAML parity.
    """

    max_seq_len: int
    n_layers: int
    n_head: int
    d_k: int
    d_v: int
    d_model: int
    d_inner: int
    fft_conv1d_kernel: int = 3
    fft_conv1d_padding: int = 1
    dropout: float = 0.1
    attn_dropout: float = 0.1
    fused_layernorm: bool = False  # XLA fuses LN; kept for config parity
    name_tag: str = ""
    capture_acts: bool = False  # sow per-layer activations (reference
    # 'acts' dict, transformer.py:131-144); read back via
    # apply(..., mutable=['intermediates'])

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        table = jnp.asarray(sinusoid_position_table(self.max_seq_len + 1, self.d_model))
        # clip positions beyond the table (reference would index-error);
        # bucketed batching keeps T <= max_seq_len in practice.
        pos = jnp.clip(pos, 0, self.max_seq_len)
        x = x + jnp.take(table, pos, axis=0)

        key_pad = pos == 0
        non_pad = (pos != 0)[..., None].astype(x.dtype)
        for i in range(self.n_layers):
            x = FFTBlock(
                d_model=self.d_model,
                d_inner=self.d_inner,
                n_head=self.n_head,
                d_k=self.d_k,
                d_v=self.d_v,
                kernel_size=self.fft_conv1d_kernel,
                dropout=self.dropout,
                attn_dropout=self.attn_dropout,
            )(x, key_pad, non_pad, deterministic)
            if self.capture_acts:
                self.sow("intermediates", f"layer_{i}", x)
        return x, non_pad


def regulate_lengths(x, durations, max_out_len: int, alpha: float = 1.0):
    """Expand [B, Lt, D] phones by integer durations -> [B, max_out_len, D].

    XLA-native replacement for the reference's per-utterance
    ``repeat_interleave`` loop (transformer.py:460-478): output frame t maps
    to the phone whose cumulative duration first exceeds t, then a batched
    gather expands the sequence. Returns (output, out_lengths, pos_ids).
    """
    reps = jnp.round(durations.astype(jnp.float32) * alpha).astype(jnp.int32)
    reps = jnp.maximum(reps, 0)
    ends = jnp.cumsum(reps, axis=-1)  # [B, Lt]
    out_lengths = ends[:, -1]
    frame = jnp.arange(max_out_len, dtype=jnp.int32)
    # phone index for frame t: number of ends <= t
    idx = jnp.sum(frame[None, :, None] >= ends[:, None, :], axis=-1)  # [B, T]
    idx = jnp.minimum(idx, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[..., None], axis=1)
    valid = frame[None, :] < out_lengths[:, None]
    out = out * valid[..., None].astype(x.dtype)
    pos = (frame[None, :] + 1) * valid.astype(jnp.int32)
    return out, out_lengths, pos


class DurationPredictor(nn.Module):
    """2x(conv1d k -> relu -> LN -> dropout) -> linear -> [B, T] durations
    (reference transformer.py:481-534)."""

    filter_size: int
    kernel: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, non_pad, deterministic: bool = True):
        x = x * non_pad
        h = nn.Conv(self.filter_size, (self.kernel,), padding="SAME", name="conv1")(x)
        h = jax.nn.relu(h)
        h = nn.LayerNorm(epsilon=LAYERNORM_EPS)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.filter_size, (self.kernel,), padding="SAME", name="conv2")(h)
        h = jax.nn.relu(h)
        h = nn.LayerNorm(epsilon=LAYERNORM_EPS)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = nn.Dense(1)(h)
        return (out * non_pad)[..., 0]


class LengthRegulator(nn.Module):
    """Duration predictor + expansion (reference transformer.py:427-478).

    Training: expand by target durations, return predicted durations for the
    loss. Inference: expand by clamp_min(pred, 0) durations (or provided
    targets). ``max_out_len`` bounds the static output length.
    """

    input_size: int
    duration_predictor_filter_size: int
    duration_predictor_kernel_size: int = 3
    dropout: float = 0.1
    fused_layernorm: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        non_pad,
        max_out_len: int,
        target: Optional[jax.Array] = None,
        alpha: float = 1.0,
        deterministic: bool = True,
    ):
        duration = DurationPredictor(
            filter_size=self.duration_predictor_filter_size,
            kernel=self.duration_predictor_kernel_size,
            dropout=self.dropout,
        )(x, non_pad, deterministic)

        if target is not None:
            expand_dur = target
            # training: raw predictions for the duration MSE loss;
            # inference with provided targets: the rounded targets.
            dur_out = duration if not deterministic else jnp.round(target).astype(jnp.int32)
        else:
            expand_dur = jnp.maximum(duration, 0.0)
            dur_out = jnp.round(expand_dur).astype(jnp.int32)
        out, out_lengths, pos = regulate_lengths(x, expand_dur, max_out_len, alpha)
        return out, out_lengths, pos, dur_out
