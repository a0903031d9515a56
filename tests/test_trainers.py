"""End-to-end trainer tests on the tiny synthetic corpus: VQ-GAN warmup +
GAN steps, checkpoint/resume, predictor training against the frozen AE, and
both inference paths (the reference's recipe-level checks, SURVEY.md 4)."""

import os

import numpy as np
import pytest

from msmctts_tpu.config import component_kwargs
from msmctts_tpu.registry import get_trainer
from msmctts_tpu.tasks import build_task
from msmctts_tpu.utils.checkpoint import find_latest_checkpoint, load_checkpoint
from tests.tiny import tiny_ae_config, tiny_am_config, write_tiny_dataset


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    write_tiny_dataset(d)
    return d


@pytest.fixture(scope="module")
def trained_ae(corpus):
    """Train the tiny AE for 4 steps (2 warmup + 2 GAN) and return the
    checkpoint path."""
    config = tiny_ae_config(corpus)
    task = build_task(config, mode="train")
    trainer = get_trainer("VQGANTrainer")(
        config, task, **component_kwargs(config.trainer)
    )
    trainer.train(max_steps=4, log_every=2)
    path = find_latest_checkpoint(config.save_checkpoint_dir)
    assert path is not None
    return path


def test_vqgan_training_and_checkpoint(trained_ae):
    ckpt = load_checkpoint(trained_ae)
    assert ckpt["iteration"] == 4
    state = ckpt["state"]
    assert "autoencoder" in state["params"]
    assert "discriminator" in state["params"]
    # codebook EMA state persisted in float32
    emb = state["codebook"]["quantizer"]["vq_0"]["embed"]
    assert emb.dtype == np.float32
    # config embedded (self-describing checkpoint)
    assert ckpt["config"]["task"]["_name"] == "MSMCTTS"
    # training actually moved the codebook away from init
    cs = state["codebook"]["quantizer"]["vq_0"]["cluster_size"]
    assert float(np.abs(cs).sum()) > 0


def test_vqgan_losses_finite(corpus):
    config = tiny_ae_config(corpus)
    config["save_checkpoint_dir"] = corpus + "/ckpt_finite"
    task = build_task(config, mode="train")
    trainer = get_trainer("VQGANTrainer")(
        config, task, **component_kwargs(config.trainer)
    )
    # drive steps manually to inspect metrics
    from msmctts_tpu.parallel.mesh import pad_batch_to_devices, shard_batch
    from msmctts_tpu.training.base_trainer import build_dataset_from_config
    from msmctts_tpu.data.loader import DataLoader
    import jax

    dataset = build_dataset_from_config(config, training=True)
    loader = iter(DataLoader(dataset, batch_size=4, num_workers=0))
    batch = pad_batch_to_devices(next(loader), trainer.n_devices)
    rng = jax.random.PRNGKey(0)
    trainer.state = trainer.init_state(rng, batch)

    sharded = shard_batch(batch, trainer.mesh)
    state, m1 = trainer.train_step(trainer.state, sharded, 1)  # warmup
    assert np.isfinite(float(m1["vq_loss"]))
    assert np.isfinite(float(m1["frame_loss"]))
    assert "d_loss" not in m1

    state, m2 = trainer.train_step(state, sharded, 3)  # GAN phase
    for key in ("vq_loss", "frame_loss", "stft_loss", "d_loss", "adv_loss", "fm_loss", "g_loss"):
        assert np.isfinite(float(m2[key])), key


def test_resume_restores_iteration(corpus, trained_ae):
    config = tiny_ae_config(corpus)
    task = build_task(config, mode="train")
    trainer = get_trainer("VQGANTrainer")(
        config, task, **component_kwargs(config.trainer)
    )
    trainer.train(max_steps=2, log_every=1)  # resumes from 4, runs to 6
    assert trainer.iteration == 6


def test_ae_inference(corpus, trained_ae, tmp_path):
    """Analysis-synthesis round trip through the task infer path."""
    import yaml

    config = tiny_ae_config(corpus)
    ckpt = load_checkpoint(trained_ae)
    task = build_task(config, mode="infer")
    task.load_variables(ckpt["state"])

    # testlist yaml (id -> {mel: path}) like test_ae.yaml
    testlist = {
        "utt000": {"mel": f"{corpus}/mel/utt000.npy"},
        "utt001": {"mel": f"{corpus}/mel/utt001.npy"},
    }
    tl_path = str(tmp_path / "test_ae.yaml")
    with open(tl_path, "w") as f:
        yaml.safe_dump(testlist, f)

    from msmctts_tpu.data.loader import finite_loader
    from msmctts_tpu.training.base_trainer import build_dataset_from_config

    dataset = build_dataset_from_config(config, training=False, id_list=tl_path)
    for batch in finite_loader(dataset, batch_size=2):
        out = task.infer_step(batch)
        assert len(out["wav"]) == 2
        for w, l in zip(out["wav"], batch["mel_length"]):
            assert w.shape[0] == int(l) * 4  # frameshift ratio
            assert np.isfinite(np.asarray(w)).all()


@pytest.fixture(scope="module")
def trained_am(corpus, trained_ae):
    config = tiny_am_config(corpus, trained_ae)
    task = build_task(config, mode="train")
    trainer = get_trainer("PredictorTrainer")(
        config, task, **component_kwargs(config.trainer)
    )
    trainer.train(max_steps=3, log_every=1)
    path = find_latest_checkpoint(config.save_checkpoint_dir)
    assert path is not None
    return path


def test_predictor_training(trained_am):
    ckpt = load_checkpoint(trained_am)
    assert ckpt["iteration"] == 3
    assert "predictor" in ckpt["state"]["params"]


def test_tts_inference(corpus, trained_ae, trained_am):
    """Full text -> waveform synthesis (reference recipe check #2)."""
    config = tiny_am_config(corpus, trained_ae)
    ckpt = load_checkpoint(trained_am)
    task = build_task(config, mode="infer")
    task.load_variables(ckpt["state"])

    batch = {
        "text": np.array(
            [[[3, 1], [5, 2], [7, 0], [2, 1], [0, 0]]], np.int32
        ),  # [B=1, L=5, 2]
        "text_length": np.array([4], np.int32),
    }
    out = task.infer_step(batch)
    assert "wav" in out and "embedding" in out
    wav = np.asarray(out["wav"][0])
    assert wav.ndim == 1 and np.isfinite(wav).all()
    assert wav.shape[0] > 0

    # forced durations (frames): phase 1 skipped, output length is exact
    forced = dict(batch, dur=np.array([[4, 8, 4, 8, 0]], np.float32))
    out2 = task.infer_step(forced)
    wav2 = np.asarray(out2["wav"][0])
    frames = 24
    ratio = wav2.shape[0] // int(out2["mel_length"][0])
    assert int(out2["mel_length"][0]) == frames
    assert wav2.shape[0] == frames * ratio and np.isfinite(wav2).all()
    assert np.array_equal(
        np.asarray(out2["duration"][0])[:4], np.array([4, 8, 4, 8], np.float32)
    )

    # single-round-trip latency mode (static bucket): same audio as the
    # dynamic two-phase path, no host bucket pick
    task.static_max_frames = 64
    out3 = task.infer_step(batch)
    task.static_max_frames = None
    np.testing.assert_allclose(
        np.asarray(out3["wav"][0]), np.asarray(out["wav"][0]), atol=1e-5
    )
    assert np.array_equal(out3["mel_length"], out["mel_length"])
