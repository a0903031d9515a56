"""Learning-signal smoke tests: losses must actually DECREASE over a few
dozen steps on the tiny corpus — catches gradient-sign/stop-gradient/EMA
mistakes that shape tests cannot.

One trainer runs a single 90-step trajectory crossing the warmup->GAN
boundary (warmup_steps=60); both tests assert on the recorded metrics, so
the expensive warmup/GAN step programs compile exactly once for the module.
"""

import jax
import numpy as np
import pytest

from msmctts_tpu.config import component_kwargs
from msmctts_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from msmctts_tpu.registry import get_trainer
from msmctts_tpu.tasks import build_task
from tests.tiny import FRAMESHIFT, MEL_DIM, tiny_ae_config

WARMUP = 60
GAN_STEPS = 30


def _fixed_batch(B=8, T=32, seed=0):
    rng = np.random.default_rng(seed)
    # deterministic "structured" mel so there is something to learn
    t = np.arange(T)[None, :, None]
    d = np.arange(MEL_DIM)[None, None, :]
    mel = np.sin(0.3 * t + 0.7 * d) + 0.1 * rng.normal(size=(B, T, MEL_DIM))
    wav = 0.2 * np.sin(
        2 * np.pi * np.arange(T * FRAMESHIFT)[None, :] / 16.0
    ) * np.ones((B, 1))
    return {
        "mel": mel.astype(np.float32),
        "mel_length": np.full((B,), T, np.int32),
        "wav": wav.astype(np.float32),
    }


@pytest.fixture(scope="module")
def trajectory():
    config = tiny_ae_config("/tmp/conv")
    config["trainer"]["warmup_steps"] = WARMUP
    task = build_task(config, mode="train")
    mesh = make_mesh(1)
    trainer = get_trainer("VQGANTrainer")(
        config, task, mesh=mesh, **component_kwargs(config.trainer)
    )
    batch = _fixed_batch()
    state = replicate_state(
        trainer.init_state(jax.random.PRNGKey(0), batch), mesh
    )
    metrics = []
    for it in range(1, WARMUP + GAN_STEPS + 1):
        state, m = trainer.train_step(state, shard_batch(batch, mesh), it)
        metrics.append({k: float(v) for k, v in m.items()})
    return metrics


def test_vqgan_warmup_losses_decrease(trajectory):
    losses = [m["g_loss"] for m in trajectory[:WARMUP]]
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.7 * first, (first, last)
    # codebook perplexity metric is produced and sane (>= 1 by definition;
    # near-1 early collapse on a tiny fixed batch matches reference
    # EMA-VQ dynamics — there is no codeword-reset mechanism to test)
    m = trajectory[WARMUP - 1]
    perp = [m[k] for k in m if k.startswith("codebook_perplexity")]
    assert len(perp) == 2 and all(np.isfinite(p) and p >= 1.0 for p in perp), perp


def test_vqgan_gan_phase_stable(trajectory):
    """GAN steps after warmup: generator and discriminator losses stay
    finite and the discriminator starts separating real from fake."""
    gan = trajectory[WARMUP:]
    assert len(gan) == GAN_STEPS
    d_losses = [m["d_loss"] for m in gan]
    for m in gan:
        assert np.isfinite(m["g_loss"])
    # D should improve on a fixed batch
    assert np.mean(d_losses[-5:]) < np.mean(d_losses[:5])
