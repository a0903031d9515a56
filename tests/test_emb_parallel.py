"""Multi-device parity for the QS-TTS trainer: codebooks, batch-norm
statistics and all three optimizers must match between 1- and 8-device
meshes on the same global batch."""

import jax
import numpy as np
import pytest

from msmctts_tpu.config import component_kwargs
from msmctts_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from msmctts_tpu.registry import get_trainer
from msmctts_tpu.tasks import build_task
from tests.tiny import FRAMESHIFT, MEL_DIM, tiny_emb_config


def _batch(B=8, T=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "emb": rng.normal(size=(B, T, 12)).astype(np.float32),
        "emb_length": np.full((B,), T, np.int32),
        "pitch": rng.normal(size=(B, T, 1)).astype(np.float32),
        "energy": rng.normal(size=(B, T, 1)).astype(np.float32),
        "mel": rng.normal(size=(B, T, MEL_DIM)).astype(np.float32),
        "wav": (rng.normal(size=(B, T * FRAMESHIFT)) * 0.1).astype(np.float32),
    }


def _run(n_devices):
    config = tiny_emb_config("/tmp/embpar")
    task = build_task(config, mode="train")
    mesh = make_mesh(n_devices)
    trainer = get_trainer("EmbVQGANTrainer")(
        config, task, mesh=mesh, **component_kwargs(config.trainer)
    )
    batch = _batch()
    state = replicate_state(trainer.init_state(jax.random.PRNGKey(0), batch), mesh)
    metrics = []
    for it in (1, 2):  # supervised phase, then GAN phase
        state, m = trainer.train_step(state, shard_batch(batch, mesh), it)
        metrics.append({k: float(v) for k, v in m.items()})
    return jax.device_get(state), metrics


def test_emb_trainer_1_vs_8_device_parity():
    assert len(jax.devices()) >= 8
    s1, m1 = _run(1)
    s8, m8 = _run(8)
    for a, b in zip(m1, m8):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=5e-5, err_msg=k)
    for key in ("codebook", "model_state"):
        for l1, l8 in zip(
            jax.tree_util.tree_leaves(s1[key]), jax.tree_util.tree_leaves(s8[key])
        ):
            np.testing.assert_allclose(
                np.asarray(l1), np.asarray(l8), rtol=5e-4, atol=5e-5
            )
