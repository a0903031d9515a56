"""Multi-device parity: the thing the reference gets WRONG (per-rank EMA
codebook drift, SURVEY.md 2.9). Here the same global batch must produce the
same losses AND the same codebook state whether the step runs on a 1-device
or an 8-device mesh, because codebook statistics are global sums that XLA
all-reduces across the mesh.

Also covers the tensor-parallel extension (parallel/sharding.py): a 2-D
data x model mesh with Megatron-style param shardings must reproduce the
single-device step (the reference has no model parallelism at all)."""

import jax
import numpy as np
import pytest

from msmctts_tpu.config import component_kwargs
from msmctts_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from msmctts_tpu.parallel.sharding import (
    make_mesh_2d,
    shard_state,
    state_shardings,
)
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


def _run_steps(n_devices, iterations, mesh=None):
    config = tiny_ae_config("/tmp/parity")
    task = build_task(config, mode="train")
    if mesh is None:
        mesh = make_mesh(n_devices)
    trainer = get_trainer("VQGANTrainer")(
        config, task, mesh=mesh, **component_kwargs(config.trainer)
    )
    batch = _make_batch()
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state = shard_state(state, mesh)
    sharded = shard_batch(batch, mesh)
    all_metrics = []
    for it in iterations:
        state, metrics = trainer.train_step(state, sharded, it)
        all_metrics.append({k: float(v) for k, v in metrics.items()})
    return jax.device_get(state), all_metrics


def _assert_state_parity(state1, state2, rtol_params=2e-3, atol_params=2e-4):
    cb1 = state1["codebook"]["quantizer"]
    cb2 = state2["codebook"]["quantizer"]
    for stage in cb1:
        for name in ("embed", "cluster_size", "embed_avg"):
            np.testing.assert_allclose(
                np.asarray(cb1[stage][name]),
                np.asarray(cb2[stage][name]),
                rtol=2e-4,
                atol=1e-5,
                err_msg=f"{stage}/{name}",
            )
    flat1 = jax.tree_util.tree_leaves(state1["params"]["autoencoder"])
    flat2 = jax.tree_util.tree_leaves(state2["params"]["autoencoder"])
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol_params, atol=atol_params
        )


# one pass crossing the warmup->GAN boundary (tiny warmup_steps=2)
# exercises BOTH phase programs with a single compile per device config
PHASE_ITERS = [1, 2, 3, 4]


@pytest.fixture(scope="module")
def single_device_reference():
    """Shared 1-device run both parity tests compare against."""
    return _run_steps(1, PHASE_ITERS)


def test_codebook_and_loss_parity_1_vs_8_devices(single_device_reference):
    phase_iters = PHASE_ITERS
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    state1, metrics1 = single_device_reference
    state8, metrics8 = _run_steps(8, phase_iters)

    for m1, m8 in zip(metrics1, metrics8):
        for k in m1:
            np.testing.assert_allclose(m1[k], m8[k], rtol=2e-4, atol=1e-5, err_msg=k)

    # parameters after optimizer updates also agree
    _assert_state_parity(state1, state8)


def test_tensor_parallel_parity_2x4_mesh(single_device_reference):
    """data=2 x model=4 mesh: Megatron-style param shardings (attention
    qkv/out, FFN w1/w2, MRF conv1/conv2 pairs) must reproduce the
    single-device step — GSPMD collectives change only reduction layout."""
    phase_iters = PHASE_ITERS
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"

    mesh = make_mesh_2d(2, 4)
    # the rules must actually shard something over 'model' at tiny scale
    config = tiny_ae_config("/tmp/parity_tp")
    task = build_task(config, mode="train")
    trainer = get_trainer("VQGANTrainer")(
        config, task, mesh=mesh, **component_kwargs(config.trainer)
    )
    state = trainer.init_state(jax.random.PRNGKey(0), _make_batch())
    specs = state_shardings(state, mesh)
    n_model_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(specs) if "model" in str(s.spec)
    )
    assert n_model_sharded > 0, "no parameter was tensor-parallel sharded"

    state1, metrics1 = single_device_reference
    state_tp, metrics_tp = _run_steps(None, phase_iters, mesh=mesh)
    for m1, mt in zip(metrics1, metrics_tp):
        for k in m1:
            np.testing.assert_allclose(m1[k], mt[k], rtol=5e-4, atol=1e-5, err_msg=k)
    _assert_state_parity(state1, state_tp, rtol_params=3e-3, atol_params=3e-4)
