"""QS-TTS synthesizer trainer e2e + multi-device parity.

One module-scoped pair of runs (1-device and 8-device) over the SAME
global loader batch feeds every test here, so the expensive supervised/GAN
step programs compile once per device config:
  * phase behavior (supervised -> GAN with sub-batch windows, prosody D)
  * 1-vs-8-device parity of metrics, codebooks, batch-norm stats, optimizers
  * the QS-TTS predictor trainer against the checkpoint saved by run1
"""

import jax
import numpy as np
import pytest

from msmctts_tpu.config import component_kwargs
from msmctts_tpu.data.loader import DataLoader
from msmctts_tpu.parallel.mesh import (
    make_mesh,
    pad_batch_to_devices,
    replicate_state,
    shard_batch,
)
from msmctts_tpu.registry import get_trainer
from msmctts_tpu.tasks import build_task
from msmctts_tpu.training.base_trainer import build_dataset_from_config
from tests.tiny import tiny_emb_config, write_tiny_emb_dataset


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("emb_corpus"))
    write_tiny_emb_dataset(d)
    return d


@pytest.fixture(scope="module")
def global_batch(corpus):
    config = tiny_emb_config(corpus)
    dataset = build_dataset_from_config(config, training=True)
    loader = iter(DataLoader(dataset, batch_size=8, num_workers=0))
    return pad_batch_to_devices(next(loader), 8)


def _run(corpus, batch, n_devices, save=False):
    config = tiny_emb_config(corpus)
    task = build_task(config, mode="train")
    mesh = make_mesh(n_devices)
    trainer = get_trainer("EmbVQGANTrainer")(
        config, task, mesh=mesh, **component_kwargs(config.trainer)
    )
    state = replicate_state(trainer.init_state(jax.random.PRNGKey(0), batch), mesh)
    sharded = shard_batch(batch, mesh)
    metrics = []
    for it in (1, 2):  # supervised phase, then GAN phase
        state, m = trainer.train_step(state, sharded, it)
        metrics.append({k: float(v) for k, v in m.items()})
    if save:
        trainer.state = state
        trainer.iteration = 2
        trainer.save()
    return jax.device_get(state), metrics


@pytest.fixture(scope="module")
def run1(corpus, global_batch):
    return _run(corpus, global_batch, 1, save=True)


@pytest.fixture(scope="module")
def run8(corpus, global_batch):
    return _run(corpus, global_batch, 8)


def test_emb_vqgan_phase_behavior(run1):
    _, (m1, m2) = run1
    # phase 1: supervised only (no decode)
    assert np.isfinite(m1["vq_loss"])
    assert np.isfinite(m1["frame_loss"])
    assert np.isfinite(m1["d_prosody_loss"])
    assert "d_loss" not in m1
    # phase 2: decode + GAN with sub-batch windows (sample_batch_size=2)
    for key in (
        "vq_loss",
        "frame_loss",
        "stft_loss",
        "d_loss",
        "adv_loss",
        "g_loss",
        "g_prosody_loss",
    ):
        assert np.isfinite(m2[key]), key


def test_emb_trainer_1_vs_8_device_parity(run1, run8):
    assert len(jax.devices()) >= 8
    s1, m1 = run1
    s8, m8 = run8
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


def test_emb_trainer_evaluate(corpus, global_batch, run1):
    """evaluate() must accept the EmbDataset batch signature (regression:
    the inherited VQGANTrainer.evaluate KeyError'd on 'mel_length' when the
    r4 emb-stage training hit its first eval interval)."""
    from types import SimpleNamespace

    config = tiny_emb_config(corpus)
    task = build_task(config, mode="train")
    mesh = make_mesh(1)
    trainer = get_trainer("EmbVQGANTrainer")(
        config, task, mesh=mesh, **component_kwargs(config.trainer)
    )
    state, _ = run1
    trainer.state = state
    payloads = []
    logger = SimpleNamespace(
        writer=object(), log=lambda it, payload: payloads.append(payload)
    )
    trainer.evaluate(shard_batch(global_batch, mesh), logger, 10)
    assert payloads and "audio" in payloads[0]
    wav, sr = payloads[0]["audio"]["eval/wav"]
    assert np.isfinite(np.asarray(wav)).all()
    assert wav.ndim == 1 and wav.size > 0


def test_nasyn_predictor_trainer(corpus, run1):
    """QS-TTS predictor against the frozen emb autoencoder saved by run1."""
    from msmctts_tpu.utils.checkpoint import find_latest_checkpoint
    from tests.tiny import tiny_am_config

    ae_ckpt = find_latest_checkpoint(
        tiny_emb_config(corpus)["save_checkpoint_dir"]
    )
    assert ae_ckpt is not None

    config = tiny_am_config(corpus, ae_ckpt)
    config["task"]["_mode"] = "train_predictor"
    config["trainer"]["_name"] = "NASynEmbFSTrainer"
    config["dataset"]["feature"] = ["text", "dur", "emb", "pitch", "energy"]
    config["dataset"]["feature_path"] = [
        f"{corpus}/phone.txt",
        f"{corpus}/dur.txt",
        f"{corpus}/emb/{{}}.npy",
        f"{corpus}/pitch/{{}}.npy",
        f"{corpus}/energy/{{}}.npy",
    ]
    config["dataset"]["dimension"] = [2, 1, 12, 1, 1]
    config["dataset"]["frameshift"] = [None, None, 4, 4, 4]
    config["dataset"]["padding_value"] = [0, 0, 0, 0, 0]
    config["task"]["predictor"]["n_pred_size"] = 16
    config["save_checkpoint_dir"] = corpus + "/ckpt_nasyn"

    task = build_task(config, mode="train")
    trainer = get_trainer("NASynEmbFSTrainer")(
        config, task, **component_kwargs(config.trainer)
    )
    dataset = build_dataset_from_config(config, training=True)
    loader = iter(DataLoader(dataset, batch_size=4, num_workers=0))
    batch = pad_batch_to_devices(next(loader), trainer.n_devices)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state = replicate_state(state, trainer.mesh)
    state, m = trainer.train_step(state, shard_batch(batch, trainer.mesh), 1)
    assert np.isfinite(float(m["total_loss"]))
    assert np.isfinite(float(m["duration_loss"]))
