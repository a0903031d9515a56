"""bf16 mixed-precision policy: steps run, params stay fp32 masters,
losses stay finite and close to the fp32 run at step 1."""

import jax
import jax.numpy as jnp
import numpy as np

from msmctts_tpu.config import component_kwargs
from msmctts_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from msmctts_tpu.registry import get_trainer
from msmctts_tpu.tasks import build_task
from tests.tiny import tiny_ae_config


def _run(precision, iters):
    config = tiny_ae_config("/tmp/prec")
    config["precision"] = precision
    task = build_task(config, mode="train")
    mesh = make_mesh(1)
    trainer = get_trainer("VQGANTrainer")(
        config, task, mesh=mesh, **component_kwargs(config.trainer)
    )
    rng = np.random.default_rng(0)
    batch = {
        "mel": rng.normal(size=(4, 16, 8)).astype(np.float32),
        "mel_length": np.full((4,), 16, np.int32),
        "wav": (rng.normal(size=(4, 64)) * 0.1).astype(np.float32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state = replicate_state(state, mesh)
    metrics = []
    for it in iters:
        state, m = trainer.train_step(state, shard_batch(batch, mesh), it)
        metrics.append({k: float(v) for k, v in m.items()})
    return jax.device_get(state), metrics


def test_bf16_step_runs_and_masters_stay_fp32():
    state, metrics = _run("bfloat16", [1, 3])  # warmup + GAN phase
    for m in metrics:
        for k, v in m.items():
            assert np.isfinite(v), k
    # fp32 masters
    for leaf in jax.tree_util.tree_leaves(state["params"]):
        assert leaf.dtype == np.float32
    # codebook EMA state fp32
    for leaf in jax.tree_util.tree_leaves(state["codebook"]):
        assert leaf.dtype == np.float32


def test_bf16_close_to_fp32_at_init():
    _, m32 = _run("float32", [1])
    _, m16 = _run("bfloat16", [1])
    # warmup losses agree to bf16 tolerance on the very first step
    for k in ("vq_loss", "frame_loss", "g_loss"):
        a, b = m32[0][k], m16[0][k]
        assert abs(a - b) / max(abs(a), 1e-6) < 0.05, (k, a, b)
