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


def test_sharded_op_matches_single_device(rng):
    """vq_nearest_stats_sharded under an 8-device mesh: indices/quant shard
    over rows, statistics are global psums — all equal to the unsharded
    kernel."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from msmctts_tpu.ops.pallas_vq import vq_nearest_stats_sharded
    from msmctts_tpu.parallel.mesh import make_mesh

    N, H, d, K = 512, 2, 8, 16
    x = rng.normal(size=(N, H, d)).astype(np.float32)
    embed = rng.normal(size=(H, d, K)).astype(np.float32)
    mask = (rng.random(N) > 0.2).astype(np.float32)

    mesh = make_mesh(8)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    es = jax.device_put(embed, NamedSharding(mesh, P()))
    ms = jax.device_put(mask, NamedSharding(mesh, P("data")))
    idx, quant, counts, sums = jax.jit(vq_nearest_stats_sharded)(xs, es, ms)

    g_idx, g_quant, g_counts, g_sums = vq_nearest_stats(
        jnp.asarray(x), jnp.asarray(embed), jnp.asarray(mask), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(g_idx))
    np.testing.assert_allclose(np.asarray(quant), np.asarray(g_quant), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(counts), np.asarray(g_counts), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sums), np.asarray(g_sums), rtol=1e-4, atol=1e-4
    )


def test_snap_kernel_matches_jax_path(rng):
    """vq_nearest (the stats-free inference entry) and its SPMD wrapper
    match the unfused path; the sharded form runs with zero collectives."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from msmctts_tpu.ops.pallas_vq import vq_nearest, vq_nearest_sharded
    from msmctts_tpu.parallel.mesh import make_mesh

    N, H, d, K = 300, 2, 16, 32  # not a tile multiple
    x = rng.normal(size=(N, H, d)).astype(np.float32)
    embed = rng.normal(size=(H, d, K)).astype(np.float32)

    idx, quant = vq_nearest(jnp.asarray(x), jnp.asarray(embed), interpret=True)
    ref_idx, _ = nearest_codes(jnp.asarray(x), jnp.asarray(embed))
    ref_quant = lookup_codes(ref_idx, jnp.asarray(embed))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(
        np.asarray(quant), np.asarray(ref_quant), rtol=1e-5, atol=1e-6
    )

    N8 = 512
    x8 = rng.normal(size=(N8, H, d)).astype(np.float32)
    mesh = make_mesh(8)
    xs = jax.device_put(x8, NamedSharding(mesh, P("data")))
    es = jax.device_put(embed, NamedSharding(mesh, P()))
    sharded_fn = jax.jit(vq_nearest_sharded)
    idx8, quant8 = sharded_fn(xs, es)
    g_idx, g_quant = vq_nearest(jnp.asarray(x8), jnp.asarray(embed), interpret=True)
    np.testing.assert_array_equal(np.asarray(idx8), np.asarray(g_idx))
    np.testing.assert_allclose(np.asarray(quant8), np.asarray(g_quant), rtol=1e-6)
    # truly stats-free: the partitioned program contains no collectives
    hlo = sharded_fn.lower(xs, es).compile().as_text()
    assert "all-reduce" not in hlo, "snap path must not psum anything"


def test_emaquantizer_pallas_path_matches_xla(rng):
    """EMAQuantizer(use_pallas=True) — the production routing — produces
    identical indices and matching quant/EMA state to the unfused path."""
    import jax

    from msmctts_tpu.models.quantizer import EMAQuantizer

    D, K, H, B, T = 16, 12, 2, 4, 70  # B*T deliberately not a tile multiple
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    lengths = np.array([70, 50, 30, 9], np.int32)
    embed = rng.normal(size=(H, D // H, K)).astype(np.float32)
    codebook = {
        "embed": jnp.asarray(embed),
        "cluster_size": jnp.zeros((H, K), jnp.float32),
        "embed_avg": jnp.asarray(embed),
    }

    outs = {}
    for flag in (False, True):
        q = EMAQuantizer(embed_dim=D, n_embed=K, n_head=H, use_pallas=flag)
        (qt, diff, idx), mut = jax.jit(
            lambda cb, xx, ll, q=q: q.apply(
                {"codebook": cb}, xx, lengths=ll, mutable=["codebook"]
            )
        )(codebook, jnp.asarray(x), jnp.asarray(lengths))
        outs[flag] = (qt, diff, idx, mut["codebook"])

    np.testing.assert_array_equal(np.asarray(outs[True][2]), np.asarray(outs[False][2]))
    np.testing.assert_allclose(
        np.asarray(outs[True][0]), np.asarray(outs[False][0]), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(outs[True][1]), np.asarray(outs[False][1]), rtol=1e-5, atol=1e-6
    )
    for name in ("embed", "cluster_size", "embed_avg"):
        np.testing.assert_allclose(
            np.asarray(outs[True][3][name]),
            np.asarray(outs[False][3][name]),
            rtol=1e-5,
            atol=1e-6,
            err_msg=name,
        )

    # inference snap path
    for flag in (False, True):
        q = EMAQuantizer(embed_dim=D, n_embed=K, n_head=H, use_pallas=flag)
        outs[f"snap_{flag}"] = q.apply(
            {"codebook": codebook}, jnp.asarray(x), method="quantize"
        )
    np.testing.assert_array_equal(
        np.asarray(outs["snap_True"][1]), np.asarray(outs["snap_False"][1])
    )
    np.testing.assert_allclose(
        np.asarray(outs["snap_True"][0]),
        np.asarray(outs["snap_False"][0]),
        rtol=1e-6,
        atol=1e-6,
    )


def test_emaquantizer_pallas_sharded_batch(rng):
    """The pallas-routed quantizer composes with pjit: an 8-way sharded
    batch yields the same indices and (psum'd) EMA state as one device."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from msmctts_tpu.models.quantizer import EMAQuantizer
    from msmctts_tpu.parallel.mesh import make_mesh

    D, K, H, B, T = 8, 10, 2, 8, 24
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    lengths = rng.integers(8, T + 1, size=(B,)).astype(np.int32)
    embed = rng.normal(size=(H, D // H, K)).astype(np.float32)
    codebook = {
        "embed": jnp.asarray(embed),
        "cluster_size": jnp.zeros((H, K), jnp.float32),
        "embed_avg": jnp.asarray(embed),
    }
    q = EMAQuantizer(embed_dim=D, n_embed=K, n_head=H, use_pallas=True)

    def step(cb, xx, ll):
        return q.apply({"codebook": cb}, xx, lengths=ll, mutable=["codebook"])

    (qt1, _, idx1), mut1 = jax.jit(step)(codebook, jnp.asarray(x), jnp.asarray(lengths))

    mesh = make_mesh(8)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ls = jax.device_put(lengths, NamedSharding(mesh, P("data")))
    cbs = jax.device_put(codebook, NamedSharding(mesh, P()))
    (qt8, _, idx8), mut8 = jax.jit(step)(cbs, xs, ls)

    np.testing.assert_array_equal(np.asarray(idx8), np.asarray(idx1))
    np.testing.assert_allclose(np.asarray(qt8), np.asarray(qt1), rtol=1e-6)
    for name in ("embed", "cluster_size", "embed_avg"):
        np.testing.assert_allclose(
            np.asarray(mut8["codebook"][name]),
            np.asarray(mut1["codebook"][name]),
            rtol=1e-5,
            atol=1e-6,
            err_msg=name,
        )
