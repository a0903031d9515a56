"""Multi-head EMA vector quantization (TPU-native).

Reimplements the reference's ``Quantize`` / ``MultiHeadQuantize``
(vqgantts/modules.py:10-169) as a single fused module:

  * All heads share one codebook tensor [H, d_sub, K] and the nearest-
    codeword search is a single batched einsum ``|x|^2 - 2 x.E + |E|^2``
    followed by argmin — one MXU contraction instead of H small matmuls.
  * EMA statistics are *masked sums* over valid frames (replacing the
    reference's per-utterance python gather, modules.py:35-45). Under pjit
    with the batch sharded over the ``data`` mesh axis these sums compile to
    cross-device all-reduces, so multi-host codebooks stay synchronized —
    fixing the reference's per-rank codebook drift (SURVEY.md 2.9).
  * Codebook state lives in the ``codebook`` flax collection (float32
    always) and is only written when the caller marks the collection
    mutable: ``apply(..., mutable=['codebook'])`` in the train step.

The straight-through estimator and the commitment diff
``(stop_grad(quant) - x)^2`` match modules.py:59-60; the triplet loss
matches ``compute_triple_loss`` (modules.py:86-116) including its
self-masking trick (entries where ``pos_loss == dist`` — the target
codeword — drop out of the hinge).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def nearest_codes(x, embed):
    """x [..., H, d], embed [H, d, K] -> (indices [..., H], dist [..., H, K]).

    Distances are squared L2 computed in float32 on the MXU.
    """
    x = x.astype(jnp.float32)
    embed = embed.astype(jnp.float32)
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # [..., H, 1]
    e_sq = jnp.sum(embed * embed, axis=1)  # [H, K]
    # full fp32 MXU precision: argmin correctness must not depend on the
    # default (bf16-ish) matmul rounding
    xe = jnp.einsum("...hd,hdk->...hk", x, embed, precision=jax.lax.Precision.HIGHEST)
    dist = x_sq - 2.0 * xe + e_sq
    return jnp.argmin(dist, axis=-1), dist


def lookup_codes(indices, embed):
    """indices [..., H], embed [H, d, K] -> [..., H, d]."""
    return _lookup(indices, jnp.swapaxes(embed, 1, 2))


def _lookup(indices, table):
    # table [H, K, d]; indices [..., H] -> vmap gather over heads
    def per_head(idx_h, tab_h):  # idx [...], tab [K, d]
        return jnp.take(tab_h, idx_h, axis=0)

    moved = jnp.moveaxis(indices, -1, 0)  # [H, ...]
    out = jax.vmap(per_head)(moved, table)  # [H, ..., d]
    return jnp.moveaxis(out, 0, -2)  # [..., H, d]


class EMAQuantizer(nn.Module):
    """H-head EMA codebook over inputs [B, T, embed_dim].

    embed_dim is split evenly across n_head sub-spaces; each head has its
    own K-entry codebook (reference MultiHeadQuantize; n_head=1 degenerates
    to the plain Quantize).
    """

    embed_dim: int
    n_embed: int
    n_head: int = 1
    decay: float = 0.99
    eps: float = 1e-5
    # > 0 enables dead-codeword restarts: codewords whose EMA cluster size
    # falls below this threshold are re-seeded from random batch vectors.
    # The reference has no such mechanism (codebooks can collapse early);
    # default off preserves its exact training semantics.
    restart_dead: float = 0.0
    # Route the nearest-codeword search + EMA statistics through the fused
    # Pallas kernel (ops/pallas_vq.py), SPMD-partitioned via
    # custom_partitioning (rows shard, stats psum). 'auto' enables it on the
    # TPU backend; the unfused XLA path is used otherwise (and always for
    # sort=True, which needs the full distance matrix).
    use_pallas: Any = "auto"

    def setup(self):
        assert self.embed_dim % self.n_head == 0
        self.sub_dim = self.embed_dim // self.n_head
        H, d, K = self.n_head, self.sub_dim, self.n_embed
        self.embed = self.variable(
            "codebook",
            "embed",
            lambda: jax.random.normal(self.make_rng("params"), (H, d, K), jnp.float32),
        )
        self.cluster_size = self.variable(
            "codebook", "cluster_size", lambda: jnp.zeros((H, K), jnp.float32)
        )
        self.embed_avg = self.variable("codebook", "embed_avg", lambda: self.embed.value.copy())

    def _variables(self):
        return self.embed, self.cluster_size, self.embed_avg

    def _pallas_enabled(self) -> bool:
        if self.use_pallas == "auto":
            return jax.default_backend() == "tpu"
        return bool(self.use_pallas)

    def __call__(
        self,
        x,
        lengths: Optional[jax.Array] = None,
        update: bool = True,
        sort: bool = False,
    ):
        """Quantize x [B, T, D] -> (quantized [B, T, D] straight-through,
        diff [B, T, D], indices [B, T, H] int32).

        EMA codebook updates run iff ``update`` and the 'codebook'
        collection is mutable in this apply call (i.e. the train step).
        Frames at t >= lengths[b] are excluded from the statistics.

        ``sort=True`` returns the full nearest-first codeword ranking
        instead of the argmin indices (reference Quantize(sort=True),
        modules.py:62-65): [B, T, K] for a single head — exactly the
        reference shape. For multi-head stacks the reference
        (MultiHeadQuantize, modules.py:137-151) forwards sort to each
        head and stacks the per-head [B, T, K] rankings on dim=-1,
        giving [B, T, K, H]; this fused module returns the transposed
        [B, T, H, K] layout instead (head axis before ranking axis, as
        everywhere else here). Note the return rank of ``indices``
        therefore depends on ``n_head`` when sort=True ([B,T,K] at H==1
        vs [B,T,H,K] at H>1), unlike the default argmin indices which
        are always [B, T, H]; head-generic callers must branch.
        """
        B, T, D = x.shape
        H, d, K = self.n_head, self.sub_dim, self.n_embed
        embed, cluster_size, embed_avg = self._variables()

        xh = x.reshape(B, T, H, d)
        if lengths is None:
            mask2d = jnp.ones((B, T), jnp.float32)
        else:
            pos = jnp.arange(T, dtype=jnp.int32)[None, :]
            mask2d = (pos < lengths.astype(jnp.int32)[:, None]).astype(jnp.float32)

        use_pallas = self._pallas_enabled() and not sort
        dist = None
        onehot_sum = embed_sum = None
        if use_pallas:
            # fused Pallas path: one kernel computes argmin indices, the
            # quantized rows, AND the masked EMA statistics (globally psum'd
            # via custom_partitioning when the batch is sharded)
            from msmctts_tpu.ops.pallas_vq import vq_nearest_stats_sharded

            xf32 = jax.lax.stop_gradient(xh.astype(jnp.float32)).reshape(B * T, H, d)
            idx_f, quant_f, onehot_sum, embed_sum = vq_nearest_stats_sharded(
                xf32, embed.value, mask2d.reshape(B * T)
            )
            indices = idx_f.reshape(B, T, H)
            quant = jax.lax.stop_gradient(quant_f).reshape(B, T, H, d)
        else:
            indices, dist = nearest_codes(xh, embed.value)  # [B, T, H]
            quant = _lookup(indices, jnp.swapaxes(embed.value, 1, 2))  # [B, T, H, d]

        if update and self.is_mutable_collection("codebook"):
            xf = xh.astype(jnp.float32)
            mask = mask2d[..., None]
            if onehot_sum is None:
                onehot = jax.nn.one_hot(indices, K, dtype=jnp.float32) * mask[..., None]
                onehot_sum = jnp.sum(onehot, axis=(0, 1))  # [H, K]  (global under pjit)
                # exact fp32 statistics: codebook EMA must not inherit the bf16
                # default matmul rounding
                embed_sum = jnp.einsum(
                    "bthd,bthk->hdk",
                    xf * mask[..., None],
                    onehot,
                    precision=jax.lax.Precision.HIGHEST,
                )

            new_cs = cluster_size.value * self.decay + (1.0 - self.decay) * onehot_sum
            new_ea = embed_avg.value * self.decay + (1.0 - self.decay) * embed_sum
            n = jnp.sum(new_cs, axis=-1, keepdims=True)  # [H, 1]
            smoothed = (new_cs + self.eps) / (n + K * self.eps) * n  # [H, K]
            new_embed = new_ea / smoothed[:, None, :]

            if self.restart_dead > 0:
                # re-seed dead codewords from random batch rows
                rkey = self.make_rng("dropout")
                ridx = jax.random.randint(rkey, (H, K), 0, B * T)  # [H, K]
                flat = xf.reshape(B * T, H, d)
                # seeds[h, k] = flat[ridx[h, k], h]
                seeds = jax.vmap(
                    lambda idx_h, h: flat[idx_h, h, :], in_axes=(0, 0)
                )(ridx, jnp.arange(H))  # [H, K, d]
                seeds = jnp.swapaxes(seeds, 1, 2)  # [H, d, K]
                dead = (new_cs < self.restart_dead)[:, None, :]  # [H, 1, K]
                new_embed = jnp.where(dead, seeds, new_embed)
                new_ea = jnp.where(dead, seeds, new_ea)
                new_cs = jnp.where(dead[:, 0, :], 1.0, new_cs)

            cluster_size.value = new_cs
            embed_avg.value = new_ea
            embed.value = new_embed

        quant = quant.reshape(B, T, D)
        # commitment diff in float32 even under bf16 activations
        diff = jnp.square(
            jax.lax.stop_gradient(quant.astype(jnp.float32)) - x.astype(jnp.float32)
        )
        quant = quant.astype(x.dtype)
        quant_st = x + jax.lax.stop_gradient(quant - x)
        if sort:
            indices = jnp.argsort(dist, axis=-1).astype(jnp.int32)  # [B,T,H,K]
            if H == 1:  # reference 1-head shape: [B, T, K] (modules.py:62-65)
                indices = indices[:, :, 0]
        return quant_st, diff, indices

    def quantize(self, x):
        """Snap embeddings to nearest codewords without statistics — the
        inference path used by predictor snapping and ``synthesis``
        (msmc_vqgan.py:372-398). Uses the stats-free kernel entry: no EMA
        counts/sums are computed (or psum'd) on this hot TTS path."""
        B, T, D = x.shape
        H, d = self.n_head, self.sub_dim
        embed, _, _ = self._variables()
        xh = x.reshape(B, T, H, d)
        if self._pallas_enabled():
            from msmctts_tpu.ops.pallas_vq import vq_nearest_sharded

            xf32 = jax.lax.stop_gradient(xh.astype(jnp.float32)).reshape(B * T, H, d)
            idx_f, quant_f = vq_nearest_sharded(xf32, embed.value)
            return (
                quant_f.reshape(B, T, D).astype(x.dtype),
                idx_f.reshape(B, T, H),
            )
        indices, _ = nearest_codes(xh, embed.value)
        quant = _lookup(indices, jnp.swapaxes(embed.value, 1, 2))
        return quant.reshape(B, T, D).astype(x.dtype), indices

    def sample(self, rng, batch_shape):
        """Draw codewords from the EMA cluster-size prior
        (reference Quantize.sample, modules.py:72-84): per head, indices ~
        Categorical(cluster_size / sum) and their embeddings."""
        embed, cluster_size, _ = self._variables()
        H, d, K = embed.value.shape
        logits = jnp.log(jnp.maximum(cluster_size.value, self.eps))  # [H, K]
        keys = jax.random.split(rng, H)
        # one vmapped categorical over heads: a single dispatch instead of
        # H sequential ones
        idx_h = jax.vmap(
            lambda k, lg: jax.random.categorical(k, lg, shape=batch_shape)
        )(keys, logits)  # [H, *batch_shape]
        idx = jnp.moveaxis(idx_h, 0, -1)  # [..., H]
        return idx, lookup_codes(idx, embed.value)

    def compute_triple_loss(self, pred, target_indices, reduction: str = "mean", margin: float = 1e-6):
        """Triplet loss against the codebook (modules.py:86-116), averaged
        over heads: pos = per-frame squared error to the target codeword;
        hinge vs. distances to all codewords with the target entry
        self-masked by the (pos_loss - dist != 0) trick."""
        B, T, D = pred.shape
        H, d = self.n_head, self.sub_dim
        embed, _, _ = self._variables()
        if target_indices.ndim == 2:
            target_indices = target_indices[..., None]

        ph = pred.reshape(B, T, H, d).astype(jnp.float32)
        _, dist = nearest_codes(ph, embed.value)  # [B, T, H, K]
        target = _lookup(target_indices, jnp.swapaxes(embed.value, 1, 2))  # [B,T,H,d]
        pos_loss = jnp.sum(jnp.square(ph - target.astype(jnp.float32)), axis=-1)  # [B,T,H]

        raw = pos_loss[..., None] - dist  # zero exactly at the target codeword
        self_mask = (raw != 0).astype(jnp.float32)
        hinge = jnp.maximum(raw + margin, 0.0) * self_mask / d  # [B,T,H,K]
        if reduction == "mean":
            per_head = jnp.mean(hinge, axis=-1)
        else:  # 'sum'
            per_head = jnp.sum(hinge, axis=-1)
        return jnp.mean(per_head, axis=-1)  # [B, T] averaged over heads
