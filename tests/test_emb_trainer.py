"""QS-TTS synthesizer trainer e2e: supervised phase, GAN phase with
sub-batch windows, adversarial prosody estimator."""

import jax
import numpy as np
import pytest

from msmctts_tpu.config import component_kwargs
from msmctts_tpu.data.loader import DataLoader
from msmctts_tpu.parallel.mesh import pad_batch_to_devices, shard_batch
from msmctts_tpu.registry import get_trainer
from msmctts_tpu.tasks import build_task
from msmctts_tpu.training.base_trainer import build_dataset_from_config
from tests.tiny import tiny_emb_config, write_tiny_emb_dataset


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("emb_corpus"))
    write_tiny_emb_dataset(d)
    return d


def test_emb_vqgan_trainer_steps(corpus):
    config = tiny_emb_config(corpus)
    task = build_task(config, mode="train")
    trainer = get_trainer("EmbVQGANTrainer")(
        config, task, **component_kwargs(config.trainer)
    )
    dataset = build_dataset_from_config(config, training=True)
    loader = iter(DataLoader(dataset, batch_size=4, num_workers=0))
    batch = pad_batch_to_devices(next(loader), trainer.n_devices)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    from msmctts_tpu.parallel.mesh import replicate_state

    state = replicate_state(state, trainer.mesh)
    sharded = shard_batch(batch, trainer.mesh)

    # phase 1: supervised only (no decode)
    state, m1 = trainer.train_step(state, sharded, 1)
    assert np.isfinite(float(m1["vq_loss"]))
    assert np.isfinite(float(m1["frame_loss"]))
    assert np.isfinite(float(m1["d_prosody_loss"]))
    assert "d_loss" not in m1

    # phase 2: decode + GAN with sub-batch windows (sample_batch_size=2)
    state, m2 = trainer.train_step(state, sharded, 2)
    for key in ("vq_loss", "frame_loss", "stft_loss", "d_loss", "adv_loss", "g_loss", "g_prosody_loss"):
        assert np.isfinite(float(m2[key])), key
    trainer.state = state
    trainer.iteration = 2
    trainer.save()


def test_nasyn_predictor_trainer(corpus):
    """QS-TTS predictor against the frozen emb autoencoder saved above."""
    import os

    from msmctts_tpu.utils.checkpoint import find_latest_checkpoint
    from tests.tiny import tiny_am_config

    ae_ckpt = find_latest_checkpoint(
        tiny_emb_config(corpus)["save_checkpoint_dir"]
    )
    assert ae_ckpt is not None, "run test_emb_vqgan_trainer_steps first"

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
    from msmctts_tpu.parallel.mesh import replicate_state

    state = replicate_state(state, trainer.mesh)
    state, m = trainer.train_step(state, shard_batch(batch, trainer.mesh), 1)
    assert np.isfinite(float(m["total_loss"]))
    assert np.isfinite(float(m["duration_loss"]))
