"""Length-mask utilities (XLA-friendly, static shapes).

The reference's ``get_mask_from_lengths`` (utils/utils.py:154-158) returns
True at *padding* positions. Here the primitive is ``sequence_mask`` with
True at *valid* positions — callers invert where the padding convention is
needed — because multiplying by a validity mask fuses into the surrounding
elementwise ops under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths, max_len: int, dtype=jnp.bool_):
    """[B] lengths -> [B, max_len] mask, True where t < length."""
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return (pos < lengths.astype(jnp.int32)[:, None]).astype(dtype)


def pad_mask(lengths, max_len: int):
    """True at padding positions (reference convention)."""
    return ~sequence_mask(lengths, max_len)


def positions_from_lengths(lengths, max_len: int):
    """1-based position ids, 0 at padding (reference msmc_vqgan.py:56-58)."""
    pos = jnp.arange(1, max_len + 1, dtype=jnp.int32)[None, :]
    return pos * sequence_mask(lengths, max_len, dtype=jnp.int32)


def masked_mean_over_valid(x, lengths, max_len: int | None = None):
    """sum(x * valid) / sum(lengths): the reference's per-frame loss
    normalization ``loss.sum() / sum(lengths)`` (msmctts_trainer.py:33-35).

    ``x`` is [B, T] or [B, T, D]; with a trailing feature dim the reference
    additionally divides by D at call sites — callers handle that.
    """
    T = x.shape[1] if max_len is None else max_len
    mask = sequence_mask(lengths, T, dtype=x.dtype)
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    total = jnp.sum(x * mask)
    return total / jnp.maximum(jnp.sum(lengths.astype(x.dtype)), 1.0)
