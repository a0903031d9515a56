"""EMA vector-quantizer unit tests against a numpy golden implementation of
the reference math (vqgantts/modules.py:10-116)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msmctts_tpu.models.quantizer import EMAQuantizer, lookup_codes, nearest_codes


def golden_ema_update(x, lengths, embed, cluster_size, embed_avg, decay=0.99, eps=1e-5):
    """Reference Quantize.forward math (modules.py:24-57) for one head,
    numpy, masked to valid frames."""
    B, T, D = x.shape
    K = embed.shape[1]  # embed [D, K]
    flat = x.reshape(-1, D)
    dist = (flat**2).sum(1, keepdims=True) - 2 * flat @ embed + (embed**2).sum(0)
    idx = dist.argmin(1)
    onehot = np.eye(K)[idx]  # [B*T, K]
    valid = (np.arange(T)[None, :] < lengths[:, None]).reshape(-1)
    onehot_v = onehot * valid[:, None]
    onehot_sum = onehot_v.sum(0)
    embed_sum = flat.T @ onehot_v  # [D, K]

    new_cs = cluster_size * decay + (1 - decay) * onehot_sum
    new_ea = embed_avg * decay + (1 - decay) * embed_sum
    n = new_cs.sum()
    smoothed = (new_cs + eps) / (n + K * eps) * n
    new_embed = new_ea / smoothed[None, :]
    quant = embed.T[idx].reshape(B, T, D)
    return idx.reshape(B, T), quant, new_cs, new_ea, new_embed


def make_quantizer(D=8, K=16, H=1):
    q = EMAQuantizer(embed_dim=D, n_embed=K, n_head=H)
    x = jnp.zeros((2, 6, D))
    variables = q.init(jax.random.PRNGKey(0), x, update=False)
    return q, variables


def test_nearest_codes_matches_bruteforce(rng):
    x = rng.normal(size=(3, 5, 2, 4)).astype(np.float32)  # [..., H=2, d=4]
    embed = rng.normal(size=(2, 4, 7)).astype(np.float32)
    idx, dist = nearest_codes(jnp.asarray(x), jnp.asarray(embed))
    # brute force
    for h in range(2):
        d = ((x[:, :, h, None, :] - embed[h].T[None, None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(idx)[..., h], d.argmin(-1))
        np.testing.assert_allclose(np.asarray(dist)[:, :, h], d, rtol=1e-4, atol=1e-4)


def test_ema_update_matches_golden(rng):
    D, K = 8, 16
    q, variables = make_quantizer(D, K, H=1)
    x = rng.normal(size=(2, 6, D)).astype(np.float32)
    lengths = np.array([6, 3], np.int32)

    embed0 = np.asarray(variables["codebook"]["embed"])[0]  # [d, K]
    cs0 = np.asarray(variables["codebook"]["cluster_size"])[0]
    ea0 = np.asarray(variables["codebook"]["embed_avg"])[0]

    (quant, diff, idx), mut = q.apply(
        variables, jnp.asarray(x), jnp.asarray(lengths), mutable=["codebook"]
    )
    g_idx, g_quant, g_cs, g_ea, g_embed = golden_ema_update(
        x, lengths, embed0, cs0, ea0
    )

    np.testing.assert_array_equal(np.asarray(idx)[..., 0], g_idx)
    np.testing.assert_allclose(np.asarray(quant), g_quant, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut["codebook"]["cluster_size"])[0], g_cs, rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mut["codebook"]["embed_avg"])[0], g_ea, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mut["codebook"]["embed"])[0], g_embed, rtol=1e-4, atol=1e-5
    )
    # commitment diff = (quant - x)^2
    np.testing.assert_allclose(
        np.asarray(diff), (g_quant - x) ** 2, rtol=1e-4, atol=1e-5
    )


def test_no_update_when_immutable(rng):
    q, variables = make_quantizer()
    x = jnp.asarray(rng.normal(size=(2, 6, 8)).astype(np.float32))
    out = q.apply(variables, x, update=True)  # codebook NOT mutable
    assert len(out) == 3


def test_straight_through_gradient(rng):
    q, variables = make_quantizer()
    x = jnp.asarray(rng.normal(size=(1, 4, 8)).astype(np.float32))

    def f(x):
        quant, diff, idx = q.apply(variables, x, update=False)
        return jnp.sum(quant * 2.0)

    g = jax.grad(f)(x)
    # straight-through: d(quant)/dx = identity
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(x), rtol=1e-6)


def test_multihead_is_per_subspace(rng):
    D, K, H = 8, 16, 2
    q, variables = make_quantizer(D, K, H)
    x = rng.normal(size=(2, 5, D)).astype(np.float32)
    quant, diff, idx = q.apply(variables, jnp.asarray(x), update=False)
    assert idx.shape == (2, 5, H)
    embed = np.asarray(variables["codebook"]["embed"])  # [H, d, K]
    xh = x.reshape(2, 5, H, D // H)
    for h in range(H):
        d = ((xh[:, :, h, None, :] - embed[h].T[None, None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(idx)[..., h], d.argmin(-1))


def test_triple_loss_self_mask(rng):
    """The target codeword's hinge term must drop out (modules.py:103-107)."""
    q, variables = make_quantizer(D=4, K=8, H=1)
    embed = np.asarray(variables["codebook"]["embed"])  # [1, 4, 8]
    # prediction exactly equal to codeword 3 -> pos_loss 0, and the
    # raw = pos - dist term is 0 at k=3 (self-masked).
    pred = np.tile(embed[0, :, 3], (1, 2, 1)).astype(np.float32)
    target_idx = np.full((1, 2, 1), 3, np.int32)
    loss = q.apply(
        variables,
        jnp.asarray(pred),
        jnp.asarray(target_idx),
        method="compute_triple_loss",
    )
    # pos = 0; raw_k = -dist_k <= 0 so hinge ~ margin only; tiny
    assert float(np.asarray(loss).max()) < 1e-3


def test_dead_codeword_restart(rng):
    """With restart_dead > 0, codewords whose EMA count stays below the
    threshold are re-seeded from batch rows (extension over the reference,
    which lets codebooks collapse)."""
    import jax

    D, K = 4, 8
    q = EMAQuantizer(embed_dim=D, n_embed=K, n_head=1, restart_dead=0.5)
    x0 = jnp.zeros((2, 6, D))
    variables = q.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0,
        update=False,
    )
    # all inputs near one point -> one codeword used, others dead
    x = jnp.asarray(100.0 + 0.01 * rng.normal(size=(2, 6, D)).astype(np.float32))
    (_, _, idx), mut = q.apply(
        variables,
        x,
        mutable=["codebook"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    embed = np.asarray(mut["codebook"]["embed"])[0]  # [d, K]
    cs = np.asarray(mut["codebook"]["cluster_size"])[0]
    used = np.unique(np.asarray(idx))
    dead = [k for k in range(K) if k not in used]
    # dead codewords were re-seeded near the batch (values ~100), counts 1
    for k in dead:
        assert abs(embed[:, k].mean() - 100.0) < 1.0
        assert cs[k] == 1.0


def test_restart_disabled_by_default(rng):
    q, variables = make_quantizer(D=4, K=8, H=1)
    x = jnp.asarray(100.0 + 0.01 * rng.normal(size=(2, 6, 4)).astype(np.float32))
    (_, _, idx), mut = q.apply(variables, x, mutable=["codebook"])
    embed = np.asarray(mut["codebook"]["embed"])[0]
    cs = np.asarray(mut["codebook"]["cluster_size"])[0]
    used = np.unique(np.asarray(idx))
    dead = [k for k in range(8) if k not in used]
    # reference semantics: no re-seeding — dead counts stay at their EMA
    # value (0 here), embeds follow the Laplace-smoothed division, and
    # nothing snaps to the batch's location with count exactly 1
    for k in dead:
        assert cs[k] == 0.0
        assert not (abs(embed[:, k].mean() - 100.0) < 1.0 and cs[k] == 1.0)


def test_lookup_roundtrip(rng):
    embed = rng.normal(size=(2, 4, 9)).astype(np.float32)
    idx = rng.integers(0, 9, size=(3, 5, 2))
    out = lookup_codes(jnp.asarray(idx), jnp.asarray(embed))
    for h in range(2):
        np.testing.assert_allclose(
            np.asarray(out)[:, :, h], embed[h].T[idx[..., h]], rtol=1e-6
        )


def test_sort_returns_full_ranking(rng):
    """sort=True returns the nearest-first codeword ranking [B,T,H,K]
    (reference Quantize(sort=True), modules.py:62-65)."""
    q, variables = make_quantizer(D=8, K=16, H=2)
    x = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    quant, diff, ranking = q.apply(variables, x, update=False, sort=True)
    assert ranking.shape == (2, 5, 2, 16)
    # first entry of the ranking is the argmin index
    _, _, argmin_idx = q.apply(variables, x, update=False)
    np.testing.assert_array_equal(np.asarray(ranking)[..., 0], np.asarray(argmin_idx))
    # ranking orders distances ascending
    embed = np.asarray(variables["codebook"]["embed"])  # [H, d, K]
    xh = np.asarray(x).reshape(2, 5, 2, 4)
    for h in range(2):
        d = ((xh[:, :, h, None, :] - embed[h].T[None, None]) ** 2).sum(-1)
        ranked = np.take_along_axis(d, np.asarray(ranking)[:, :, h], axis=-1)
        assert (np.diff(ranked, axis=-1) >= -1e-5).all()


def test_sort_single_head_matches_reference_shape(rng):
    """1-head sort=True is [B, T, K] — exactly the reference Quantize
    (modules.py:62-65), so downstream consumers of the reference API port
    without a squeeze."""
    q, variables = make_quantizer(D=8, K=16, H=1)
    x = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    _, _, ranking = q.apply(variables, x, update=False, sort=True)
    assert ranking.shape == (2, 5, 16)
    _, _, argmin_idx = q.apply(variables, x, update=False)
    np.testing.assert_array_equal(
        np.asarray(ranking)[..., 0], np.asarray(argmin_idx)[..., 0]
    )
