"""Model-level forward/analysis/synthesis shape and semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msmctts_tpu.config import component_kwargs
from msmctts_tpu.models.hifigan import HifiGANGenerator, UnivNetDiscriminator
from msmctts_tpu.models.msmc_vqgan import MSMCVQGAN
from msmctts_tpu.models.predictor import MultiStagePredictor
from tests.tiny import MEL_DIM, tiny_ae_config, tiny_am_config


@pytest.fixture(scope="module")
def ae():
    cfg = tiny_ae_config("/tmp/unused")
    node = cfg.task["autoencoder"]
    module = MSMCVQGAN(**component_kwargs(node))
    mel = jnp.zeros((2, 16, MEL_DIM))
    lengths = jnp.asarray([16, 12])
    variables = module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        mel,
        lengths,
        warmup=False,
        deterministic=False,
    )
    return module, variables


def test_hifigan_generator_shapes(rng):
    m = HifiGANGenerator(
        resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]],
        upsample_rates=[2, 2],
        upsample_initial_channel=16,
        upsample_kernel_sizes=[4, 4],
        num_mels=8,
    )
    x = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 40, 1)
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh range


def test_univnet_discriminator_shapes(rng):
    m = UnivNetDiscriminator(
        mrd_config=dict(
            hop_lengths=[4, 8],
            hidden_channels=[32, 32],
            domain="double",
            mel_scale=True,
            sample_rate=1600,
        ),
        mpd_config=dict(periods=[2, 3], channels=4, max_channels=16),
    )
    wav = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), wav)
    scores, fmaps = m.apply(variables, wav)
    assert len(scores) == 4  # 2 MRD + 2 MPD
    assert len(fmaps) == 4


def test_ae_forward_shapes(ae, rng):
    module, variables = ae
    mel = jnp.asarray(rng.normal(size=(2, 16, MEL_DIM)).astype(np.float32))
    lengths = jnp.asarray([16, 12])
    out, mut = module.apply(
        variables,
        mel,
        lengths,
        warmup=False,
        deterministic=False,
        mutable=["codebook"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out["decoder_outputs"].shape == (2, 64, 1)  # 16 frames x 4
    assert out["mel_outputs"].shape == (2, 16, MEL_DIM)
    assert len(out["encoder_diffs"]) == 2  # stages, coarsest first
    # coarsest stage has 8 frames (scale 2), finest 16
    assert out["encoder_indices"][0].shape == (2, 8, 2)  # [B, T/2, heads]
    assert out["encoder_indices"][1].shape == (2, 16, 2)
    assert out["decoder_diffs"] is not None  # prior loss present in training


def test_ae_windowed_decode(ae, rng):
    module, variables = ae
    mel = jnp.asarray(rng.normal(size=(2, 16, MEL_DIM)).astype(np.float32))
    lengths = jnp.asarray([16, 16])
    out = module.apply(
        variables,
        mel,
        lengths,
        warmup=False,
        window_starts=jnp.asarray([0, 4]),
        window_frames=8,
        deterministic=True,
    )
    assert out["decoder_outputs"].shape == (2, 32, 1)  # 8 frames x 4


def test_ae_analysis_synthesis_roundtrip(ae, rng):
    module, variables = ae
    mel = jnp.asarray(rng.normal(size=(2, 16, MEL_DIM)).astype(np.float32))
    lengths = jnp.asarray([16, 12])
    q = module.apply(variables, mel, lengths, method="analysis", deterministic=True)
    assert set(q) >= {
        "quantizer_outputs",
        "quantizer_diffs",
        "quantizer_indices",
        "quantizer_lengths",
        "residual_output",
    }
    wav = module.apply(
        variables,
        q["quantizer_outputs"],
        q["quantizer_lengths"],
        method="synthesis",
        deterministic=True,
    )
    assert wav.shape == (2, 64, 1)


def test_synthesis_snaps_to_codewords(ae, rng):
    """synthesis() re-quantizes arbitrary embeddings: outputs must be
    identical for inputs snapped to the same codewords."""
    module, variables = ae
    q0 = rng.normal(size=(2, 8, 16)).astype(np.float32)
    q1 = rng.normal(size=(2, 16, 16)).astype(np.float32)
    lengths = [jnp.asarray([8, 8]), jnp.asarray([16, 16])]

    wav_a = module.apply(
        variables, [jnp.asarray(q0), jnp.asarray(q1)], lengths,
        method="synthesis", deterministic=True,
    )
    # tiny perturbation should (almost surely) keep nearest codewords stable
    wav_b = module.apply(
        variables,
        [jnp.asarray(q0 + 1e-5), jnp.asarray(q1 + 1e-5)],
        lengths,
        method="synthesis",
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(wav_a), np.asarray(wav_b), atol=1e-5)


def test_predictor_teacher_forced(rng):
    cfg = tiny_am_config("/tmp/unused", "/tmp/none")
    node = cfg.task["predictor"]
    m = MultiStagePredictor(**component_kwargs(node))
    B, Lt, T = 2, 6, 16
    text = jnp.asarray(rng.integers(1, 20, size=(B, Lt, 2)).astype(np.int32))
    text_length = jnp.asarray([6, 4])
    dur = jnp.asarray(
        np.array([[3, 3, 2, 3, 3, 2], [4, 4, 4, 4, 0, 0]], np.float32)
    )
    feat = [
        jnp.asarray(rng.normal(size=(B, 8, 16)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, 16, 16)).astype(np.float32)),
    ]
    feat_length = [jnp.asarray([8, 8]), jnp.asarray([16, 16])]
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text,
        text_length,
        dur=dur,
        feat=feat,
        feat_length=feat_length,
        deterministic=False,
    )
    out = m.apply(
        variables,
        text,
        text_length,
        dur=dur,
        feat=feat,
        feat_length=feat_length,
        deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert len(out["feat"]) == 2
    assert out["feat"][0].shape == (B, 8, 16)  # coarsest first
    assert out["feat"][1].shape == (B, 16, 16)
    assert out["duration"].shape == (B, Lt)


def test_predictor_inference_with_snapping(rng):
    cfg = tiny_am_config("/tmp/unused", "/tmp/none")
    node = cfg.task["predictor"]
    m = MultiStagePredictor(**component_kwargs(node))
    B, Lt = 2, 6
    text = jnp.asarray(rng.integers(1, 20, size=(B, Lt, 2)).astype(np.int32))
    text_length = jnp.asarray([6, 4])
    dur = jnp.asarray(np.array([[3, 3, 2, 3, 3, 2], [4, 4, 4, 4, 0, 0]], np.float32))
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text,
        text_length,
        dur=dur,
        max_frames=16,
        deterministic=False,
    )
    codebooks = [
        jnp.asarray(rng.normal(size=(2, 8, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(2, 8, 8)).astype(np.float32)),
    ]
    out = m.apply(
        variables,
        text,
        text_length,
        dur=dur,
        max_frames=16,
        codebooks=codebooks,
        deterministic=True,
    )
    # every prediction must be an exact concatenation of codewords
    pred = np.asarray(out["feat"][0])  # [B, 8, 16]
    ph = pred.reshape(B, 8, 2, 8)
    cb = np.asarray(codebooks[0])  # [H=2, d=8, K=8]
    for h in range(2):
        dists = ((ph[:, :, h, None, :] - cb[h].T[None, None]) ** 2).sum(-1)
        assert float(dists.min(-1).max()) < 1e-9

    durations = m.apply(variables, text, text_length, method="predict_durations")
    assert durations.shape == (B, Lt)
    assert float(durations.min()) >= 0.0
