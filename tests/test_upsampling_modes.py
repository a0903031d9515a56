"""Quantizer 'mapping'/'residual' upsampling modes and the
sample_lengths=-1 (full-utterance decode) trainer path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msmctts_tpu.config import component_kwargs
from msmctts_tpu.models.msmc_vqgan import MSMCVQGAN
from msmctts_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from msmctts_tpu.registry import get_trainer
from msmctts_tpu.tasks import build_task
from tests.tiny import MEL_DIM, tiny_ae_config


@pytest.mark.parametrize("mode", ["mapping", "residual"])
def test_learned_upsampling_modes(rng, mode):
    cfg = tiny_ae_config("/tmp/unused")
    node = dict(component_kwargs(cfg.task["autoencoder"]))
    node["quantizer_config"] = dict(node["quantizer_config"], upsampling=mode)
    m = MSMCVQGAN(**node)
    mel = jnp.asarray(rng.normal(size=(2, 16, MEL_DIM)).astype(np.float32))
    lengths = jnp.asarray([16, 12])
    v = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        mel, lengths, warmup=False, deterministic=False,
    )
    out = m.apply(v, mel, lengths, deterministic=True)
    assert out["decoder_outputs"].shape == (2, 64, 1)
    # learned upsamplers exist in the param tree
    assert any(k.startswith("up_") for k in v["params"]["quantizer"])


def test_full_utterance_gan_step(rng):
    """sample_lengths == -1: GAN phase decodes and discriminates the whole
    padded utterance (no windows)."""
    config = tiny_ae_config("/tmp/fullutt")
    config["trainer"]["sample_lengths"] = -1
    config["trainer"]["warmup_steps"] = 0
    task = build_task(config, mode="train")
    mesh = make_mesh(1)
    trainer = get_trainer("VQGANTrainer")(
        config, task, mesh=mesh, **component_kwargs(config.trainer)
    )
    assert trainer.frame_lengths == -1
    batch = {
        "mel": rng.normal(size=(4, 16, MEL_DIM)).astype(np.float32),
        "mel_length": np.full((4,), 16, np.int32),
        "wav": (rng.normal(size=(4, 64)) * 0.1).astype(np.float32),
    }
    state = replicate_state(trainer.init_state(jax.random.PRNGKey(0), batch), mesh)
    state, m = trainer.train_step(state, shard_batch(batch, mesh), 1)
    for k in ("g_loss", "d_loss", "stft_loss"):
        assert np.isfinite(float(m[k])), k
