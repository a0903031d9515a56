"""Streaming (chunked) HiFi-GAN decode for low time-to-first-audio.

The reference (hhguo/MSMC-TTS) always decodes whole utterances
(msmc_vqgan.py:372-398); first-audio latency therefore grows linearly
with utterance length. Because the generator is a finite-receptive-field
convolutional stack (no attention, no recurrence), any output sample
depends only on input frames within a fixed radius R
(``models.hifigan.receptive_field_frames``). Decoding a window of
``chunk + 2*R`` frames therefore reproduces the monolithic decode
EXACTLY over the interior ``chunk`` frames — not approximately: the
kept samples see identical input windows and identical kernels, and
windows at the sequence edges are anchored to the true edge so the
convolutions' zero padding coincides with the monolithic one. Equality
is asserted in tests/test_streaming.py.

TPU shape discipline: every chunk of one utterance reuses ONE compiled
graph — the window extraction is a ``lax.dynamic_slice`` with a traced
start index inside the jitted decode, so chunk position never retraces,
and the full feature sequence stays device-resident across chunks (one
H2D per utterance, one small D2H per chunk).

Cost model: compute overhead vs monolithic is (chunk + 2R) / chunk
(R ~ 20 frames for the CSMSC recipe, so chunk=64 costs ~1.6x FLOPs)
while time-to-first-audio drops from decode(T) to decode(chunk + 2R).
"""

from __future__ import annotations

import math
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["StreamingDecoder"]


class StreamingDecoder:
    """Chunked decode over a window function.

    ``window_decode_fn(features, start)`` must decode the static-size
    window ``features[:, start:start+window_frames]`` to a waveform of
    ``window_frames * hop`` samples (trailing axes are flattened). Use
    the factories (:meth:`from_generator`, :meth:`from_feature_fn`)
    rather than building one by hand.
    """

    def __init__(
        self,
        window_decode_fn: Callable,
        full_decode_fn: Callable,
        hop: int,
        context_frames: int,
        chunk_frames: int = 64,
    ):
        if chunk_frames < 1:
            raise ValueError(f"chunk_frames must be >= 1, got {chunk_frames}")
        self._window_decode = window_decode_fn
        self._full_decode = full_decode_fn
        self.hop = int(hop)
        self.context_frames = int(context_frames)
        self.chunk_frames = int(chunk_frames)
        self.window_frames = self.chunk_frames + 2 * self.context_frames

    # -- factories ---------------------------------------------------------

    @classmethod
    def from_generator(
        cls,
        generator,
        params,
        decoder_config: dict,
        chunk_frames: int = 64,
        context_frames: Optional[int] = None,
    ) -> "StreamingDecoder":
        """Stream a flax ``HifiGANGenerator`` (or any module whose
        ``apply(params, feats)`` maps [B, T, C] -> [B, T*hop, 1]).

        ``params`` are jit arguments, not trace constants, so they are
        never fetched host-side (see CLAUDE.md on D2H latency).
        """
        from msmctts_tpu.models.hifigan import receptive_field_frames

        if context_frames is None:
            context_frames = receptive_field_frames(decoder_config)
        hop = int(np.prod(np.asarray(decoder_config["upsample_rates"])))
        window = chunk_frames + 2 * context_frames

        @jax.jit
        def window_decode(p, feats, start):
            b, _, c = feats.shape
            win = jax.lax.dynamic_slice(feats, (0, start, 0), (b, window, c))
            return generator.apply(p, win)

        full_decode = jax.jit(generator.apply)
        sd = cls(
            lambda feats, start: window_decode(params, feats, start),
            lambda feats: full_decode(params, feats),
            hop,
            context_frames,
            chunk_frames,
        )
        sd._window_decode_jit = window_decode  # introspection (tests assert one trace)
        return sd

    @classmethod
    def from_feature_fn(
        cls,
        decode_fn: Callable,
        decoder_config: dict,
        chunk_frames: int = 64,
        context_frames: Optional[int] = None,
    ) -> "StreamingDecoder":
        """Stream an arbitrary features->waveform callable with the same
        receptive field as ``decoder_config`` — e.g. the int8 serving
        decoder (``ops.int8_generator.Int8Decoder.apply``; exact when its
        activation scales are static/calibrated — dynamic per-tensor
        scales depend on window content and break bit-equality)."""
        from msmctts_tpu.models.hifigan import receptive_field_frames

        if context_frames is None:
            context_frames = receptive_field_frames(decoder_config)
        hop = int(np.prod(np.asarray(decoder_config["upsample_rates"])))
        window = chunk_frames + 2 * context_frames

        @jax.jit
        def extract(feats, start):
            b, _, c = feats.shape
            return jax.lax.dynamic_slice(feats, (0, start, 0), (b, window, c))

        return cls(
            lambda feats, start: decode_fn(extract(feats, start)),
            decode_fn,
            hop,
            context_frames,
            chunk_frames,
        )

    # -- streaming ---------------------------------------------------------

    def stream(self, features) -> Iterator[np.ndarray]:
        """Yield waveform chunks [B, <=chunk_frames*hop] left to right;
        their concatenation equals the monolithic decode of ``features``
        [B, T, C]. Utterances shorter than one window fall back to a
        single full decode (own compile per distinct T)."""
        features = jnp.asarray(features)
        if features.ndim != 3:
            raise ValueError(f"features must be [B, T, C], got {features.shape}")
        b, t, _ = features.shape
        s, r, w, hop = self.chunk_frames, self.context_frames, self.window_frames, self.hop

        if t <= w:
            wav = self._full_decode(features)
            yield np.asarray(wav).reshape(b, -1)[:, : t * hop]
            return

        for i in range(math.ceil(t / s)):
            keep_lo = i * s
            keep_hi = min(t, keep_lo + s)
            # Clamp the window inside the sequence: at the edges the
            # window boundary coincides with the true sequence boundary,
            # so conv zero padding matches the monolithic decode; in the
            # interior the kept region sits >= R frames from both window
            # edges, outside the padding's reach.
            start = min(max(keep_lo - r, 0), t - w)
            wav = np.asarray(self._window_decode(features, start)).reshape(b, -1)
            off = (keep_lo - start) * hop
            yield wav[:, off : off + (keep_hi - keep_lo) * hop]

    def decode(self, features) -> np.ndarray:
        """Convenience: concatenate all chunks ([B, T*hop])."""
        return np.concatenate(list(self.stream(features)), axis=1)
