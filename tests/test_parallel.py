"""Multi-device parity: the thing the reference gets WRONG (per-rank EMA
codebook drift, SURVEY.md 2.9). Here the same global batch must produce the
same losses AND the same codebook state whether the step runs on a 1-device
or an 8-device mesh, because codebook statistics are global sums that XLA
all-reduces across the mesh."""

import jax
import numpy as np
import pytest

from msmctts_tpu.config import component_kwargs
from msmctts_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from msmctts_tpu.registry import get_trainer
from msmctts_tpu.tasks import build_task
from tests.tiny import tiny_ae_config


def _make_batch(B=8, T=16, fshift=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "mel": rng.normal(size=(B, T, 8)).astype(np.float32),
        "mel_length": np.full((B,), T, np.int32),
        "wav": (rng.normal(size=(B, T * fshift)) * 0.1).astype(np.float32),
    }


def _run_steps(n_devices, iterations):
    config = tiny_ae_config("/tmp/parity")
    task = build_task(config, mode="train")
    mesh = make_mesh(n_devices)
    trainer = get_trainer("VQGANTrainer")(
        config, task, mesh=mesh, **component_kwargs(config.trainer)
    )
    batch = _make_batch()
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state = replicate_state(state, mesh)
    sharded = shard_batch(batch, mesh)
    all_metrics = []
    for it in iterations:
        state, metrics = trainer.train_step(state, sharded, it)
        all_metrics.append({k: float(v) for k, v in metrics.items()})
    return jax.device_get(state), all_metrics


def test_codebook_and_loss_parity_1_vs_8_devices():
    # one pass crossing the warmup->GAN boundary (tiny warmup_steps=2)
    # exercises BOTH phase programs with a single compile per device config
    phase_iters = [1, 2, 3, 4]
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    state1, metrics1 = _run_steps(1, phase_iters)
    state8, metrics8 = _run_steps(8, phase_iters)

    for m1, m8 in zip(metrics1, metrics8):
        for k in m1:
            np.testing.assert_allclose(m1[k], m8[k], rtol=2e-4, atol=1e-5, err_msg=k)

    cb1 = state1["codebook"]["quantizer"]
    cb8 = state8["codebook"]["quantizer"]
    for stage in cb1:
        for name in ("embed", "cluster_size", "embed_avg"):
            np.testing.assert_allclose(
                np.asarray(cb1[stage][name]),
                np.asarray(cb8[stage][name]),
                rtol=2e-4,
                atol=1e-5,
                err_msg=f"{stage}/{name}",
            )

    # parameters after optimizer updates also agree
    flat1 = jax.tree_util.tree_leaves(state1["params"]["autoencoder"])
    flat8 = jax.tree_util.tree_leaves(state8["params"]["autoencoder"])
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)
