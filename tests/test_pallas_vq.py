"""Pallas fused VQ kernel parity vs the unfused jax path (interpret mode
on CPU; the same kernel compiles for real TPU)."""

import jax.numpy as jnp
import numpy as np

from msmctts_tpu.models.quantizer import lookup_codes, nearest_codes
from msmctts_tpu.ops.pallas_vq import TILE_M, vq_nearest_stats


def test_vq_kernel_matches_jax_path(rng):
    N, H, d, K = 300, 2, 16, 32  # N deliberately not a tile multiple
    x = rng.normal(size=(N, H, d)).astype(np.float32)
    embed = rng.normal(size=(H, d, K)).astype(np.float32)
    mask = (rng.random(N) > 0.2).astype(np.float32)

    idx, quant, counts, sums = vq_nearest_stats(
        jnp.asarray(x), jnp.asarray(embed), jnp.asarray(mask), interpret=True
    )

    ref_idx, _ = nearest_codes(jnp.asarray(x), jnp.asarray(embed))
    ref_quant = lookup_codes(ref_idx, jnp.asarray(embed))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(
        np.asarray(quant), np.asarray(ref_quant), rtol=1e-5, atol=1e-6
    )

    # masked statistics vs numpy golden
    onehot = np.zeros((N, H, K), np.float64)
    for h in range(H):
        onehot[np.arange(N), h, np.asarray(idx)[:, h]] = 1.0
    onehot *= mask[:, None, None]
    g_counts = onehot.sum(axis=0)  # [H, K]
    g_sums = np.einsum("nhd,nhk->hdk", x.astype(np.float64), onehot)
    np.testing.assert_allclose(np.asarray(counts), g_counts, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sums), g_sums, rtol=1e-4, atol=1e-4)


def test_vq_kernel_exact_tile_multiple(rng):
    N, H, d, K = TILE_M * 2, 1, 8, 16
    x = rng.normal(size=(N, H, d)).astype(np.float32)
    embed = rng.normal(size=(H, d, K)).astype(np.float32)
    mask = np.ones(N, np.float32)
    idx, quant, counts, sums = vq_nearest_stats(
        jnp.asarray(x), jnp.asarray(embed), jnp.asarray(mask), interpret=True
    )
    assert idx.shape == (N, H)
    assert float(counts.sum()) == N  # every (valid) row counted once per head
