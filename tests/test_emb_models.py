"""QS-TTS family tests: MAMS encoder, MSMCVQGANEmb, ECAPA-TDNN global
encoder, KMeans baseline, EmbVC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msmctts_tpu.models.msmc_vqgan_emb import (
    EmbVC,
    KMeansVQGANEmb,
    MSMCVQGANEmb,
)
from msmctts_tpu.models.tdnn import ECAPA_TDNN

EMB_DIM, MODEL, MEL_DIM = 12, 16, 8

ENC_CFG = dict(
    downsample_scales=[1, 2],
    max_seq_len=64,
    n_layers=1,
    n_head=2,
    d_k=8,
    d_v=8,
    d_inner=32,
    dropout=0.1,
    attn_dropout=0.0,
)
QUANT_CFG = dict(
    embedding_sizes=8,
    embedding_dims=16,
    n_heads=2,
    prior_config={"kernel_size": 3, "dilation_rate": 1, "n_layers": 1},
)
DEC_CFG = dict(
    upsample_rates=[2, 2],
    upsample_kernel_sizes=[4, 4],
    upsample_initial_channel=16,
    resblock_kernel_sizes=[3],
    resblock_dilation_sizes=[[1, 3]],
)


def _inputs(rng, B=2, T=16):
    return dict(
        emb=jnp.asarray(rng.normal(size=(B, T, EMB_DIM)).astype(np.float32)),
        emb_length=jnp.asarray([T, T - 4]),
        pitch=jnp.asarray(rng.normal(size=(B, T, 1)).astype(np.float32)),
        energy=jnp.asarray(rng.normal(size=(B, T, 1)).astype(np.float32)),
        mel=jnp.asarray(rng.normal(size=(B, T, MEL_DIM)).astype(np.float32)),
    )


def test_ecapa_tdnn_shapes(rng):
    m = ECAPA_TDNN(in_channels=MEL_DIM, embd_dim=MODEL, channels=32, scale=4)
    x = jnp.asarray(rng.normal(size=(2, 20, MEL_DIM)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, MODEL)

    # manipulate: mixing one ref with weight 1 == plain forward pre-BN path
    out2 = m.apply(
        variables, [x, x], jnp.asarray([[0.5, 0.5], [0.5, 0.5]]), method="manipulate"
    )
    assert out2.shape == (2, MODEL)


@pytest.fixture(scope="module")
def emb_model():
    m = MSMCVQGANEmb(
        emb_dim=EMB_DIM,
        n_model_size=MODEL,
        encoder_config=ENC_CFG,
        quantizer_config=QUANT_CFG,
        global_encoder_config={"_name": "ECAPA_TDNN"},
        decoder_config=DEC_CFG,
        pred_mel=True,
        mel_dim=MEL_DIM,
    )
    rng = np.random.default_rng(0)
    inp = _inputs(rng)
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **inp,
        deterministic=False,
    )
    return m, variables


def test_emb_forward(emb_model, rng):
    m, variables = emb_model
    inp = _inputs(rng)
    out, mut = m.apply(
        variables,
        **inp,
        deterministic=False,
        mutable=["codebook", "batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out["decoder_outputs"].shape == (2, 64, 1)
    assert out["mel_outputs"].shape == (2, 16, MEL_DIM)
    assert out["content_representations"].shape == (2, 16, MODEL)
    assert len(out["encoder_diffs"]) == 2
    assert out["decoder_diffs"] is not None


def test_emb_subbatch_window(emb_model, rng):
    """(i, s) sub-batch windows: 3 windows from a batch of 2."""
    m, variables = emb_model
    inp = _inputs(rng)
    out = m.apply(
        variables,
        **inp,
        window_indices=jnp.asarray([0, 1, 1]),
        window_starts=jnp.asarray([0, 2, 4]),
        window_frames=8,
        deterministic=True,
    )
    assert out["decoder_outputs"].shape == (3, 32, 1)


def test_emb_analysis_synthesis(emb_model, rng):
    m, variables = emb_model
    inp = _inputs(rng)
    q = m.apply(
        variables,
        inp["emb"],
        inp["emb_length"],
        inp["pitch"],
        inp["energy"],
        method="analysis",
        deterministic=True,
    )
    wav = m.apply(
        variables,
        q["quantizer_outputs"],
        q["quantizer_lengths"],
        ref=inp["mel"],
        method="synthesis",
        deterministic=True,
    )
    assert wav.shape == (2, 64, 1)


def test_kmeans_vqgan(rng, tmp_path):
    centroids = rng.normal(size=(8, EMB_DIM)).astype(np.float32)
    path = str(tmp_path / "kmeans.npy")
    np.save(path, centroids)
    m = KMeansVQGANEmb(
        emb_dim=EMB_DIM,
        n_model_size=MODEL,
        quantizer_path=path,
        decoder_config=DEC_CFG,
        pred_mel=True,
        mel_dim=MEL_DIM,
    )
    inp = _inputs(rng)
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inp["emb"],
        inp["emb_length"],
    )
    out = m.apply(variables, inp["emb"], inp["emb_length"], deterministic=True)
    assert out["decoder_outputs"].shape == (2, 64, 1)
    idx = np.asarray(out["encoder_indices"][0])
    # indices must pick the true nearest centroid
    emb_np = np.asarray(inp["emb"])
    d = ((emb_np[:, :, None, :] - centroids[None, None]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, d.argmin(-1))


def test_emb_vc(rng):
    m = EmbVC(
        emb_dim=EMB_DIM,
        n_model_size=MODEL,
        encoder_config=ENC_CFG,
        global_encoder_config={"_name": "ECAPA_TDNN"},
        decoder_config=DEC_CFG,
        mel_dim=MEL_DIM,
    )
    inp = _inputs(rng)
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **inp,
        deterministic=False,
    )
    out = m.apply(variables, **inp, deterministic=True)
    # continuous bottleneck decodes the COARSEST stage (reference
    # msmc_vqgan_emb.py:531 uses encoder_outputs[-1]): 8 frames x 4
    assert out["decoder_outputs"].shape == (2, 32, 1)
    assert "encoder_indices" not in out
