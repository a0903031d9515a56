"""Every shipped example YAML must load, resolve its registry names, build
its task (all networks constructed), and build its trainer.

Guards against the reference's LJSpeech failure mode — configs naming
classes that no longer exist (SURVEY.md 2.11) — and against kwarg drift in
any recipe. Construction only (no init): registry resolution and module
__init__ validation is where a typo'd ``_name``/kwarg fails.
"""

import glob
import os

import pytest

from msmctts_tpu.config import Config, component_kwargs
from msmctts_tpu.registry import get_trainer
from msmctts_tpu.tasks import build_task

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "examples", "*", "configs", "**", "*.yaml"), recursive=True))


def test_all_configs_found():
    # CSMSC (2) + LJSpeech (2) + QS-TTS (2)
    assert len(CONFIGS) >= 6, CONFIGS


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: os.path.relpath(p, REPO))
def test_config_builds_task_and_trainer(path):
    config = Config(path)
    task = build_task(config, mode="train")
    assert task.networks, f"{path}: no networks built"
    trainer_cfg = config.trainer
    trainer_cls = get_trainer(trainer_cfg["_name"])
    trainer = trainer_cls(config, task, **component_kwargs(trainer_cfg))
    assert trainer is not None


@pytest.mark.parametrize(
    "path",
    [p for p in CONFIGS if "_am" not in p and "predictor" not in p],
    ids=lambda p: os.path.relpath(p, REPO),
)
def test_autoencoder_configs_init_tiny(path):
    """Full-size module trees initialize on tiny batch shapes (catches
    kwarg/shape mismatches construction alone cannot)."""
    import jax
    import jax.numpy as jnp

    config = Config(path)
    task = build_task(config, mode="train")
    ae = task.networks["autoencoder"]
    node = config.task["autoencoder"]
    in_dim = node.get("in_dim") or node.get("emb_dim")
    scales = node["encoder_config"]["downsample_scales"]
    T = 8
    for s in scales:
        T = max(T, s * 8)
    B = 2
    feat = jnp.zeros((B, T, int(in_dim)), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)

    if node["_name"] == "MSMCVQGAN":
        kwargs = dict(warmup=True, deterministic=True)
    else:  # MSMCVQGANEmb surface (decode=False skips the waveform stack)
        kwargs = dict(decode=False, deterministic=True)
    variables = jax.jit(
        lambda k: ae.init({"params": k, "dropout": k}, feat, lengths, **kwargs)
    )(jax.random.PRNGKey(0))
    assert "params" in variables and "codebook" in variables
