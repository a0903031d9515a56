"""StableHLO export (msmctts_tpu/export.py): the serialized artifact must
reproduce the task inference path exactly, with no model code at load
time."""

import json
import os

import numpy as np
import pytest

from msmctts_tpu.config import component_kwargs
from msmctts_tpu.export import ExportedTTS, save_artifacts
from msmctts_tpu.registry import get_trainer
from msmctts_tpu.tasks import build_task
from msmctts_tpu.utils.checkpoint import find_latest_checkpoint, load_checkpoint
from tests.tiny import tiny_ae_config, tiny_am_config, write_tiny_dataset


@pytest.fixture(scope="module")
def am_task(tmp_path_factory):
    corpus = str(tmp_path_factory.mktemp("export_corpus"))
    write_tiny_dataset(corpus)
    ae_cfg = tiny_ae_config(corpus)
    task = build_task(ae_cfg, mode="train")
    get_trainer("VQGANTrainer")(
        ae_cfg, task, **component_kwargs(ae_cfg.trainer)
    ).train(max_steps=3, log_every=1)
    ae_ckpt = find_latest_checkpoint(ae_cfg.save_checkpoint_dir)

    am_cfg = tiny_am_config(corpus, ae_ckpt)
    task = build_task(am_cfg, mode="train")
    get_trainer("PredictorTrainer")(
        am_cfg, task, **component_kwargs(am_cfg.trainer)
    ).train(max_steps=2, log_every=1)
    am_ckpt = find_latest_checkpoint(am_cfg.save_checkpoint_dir)

    task = build_task(am_cfg, mode="infer")
    task.load_variables(load_checkpoint(am_ckpt)["state"])
    task.pre_infer()
    return task


def _batch(B=2, Lt=8):
    rng = np.random.default_rng(3)
    text = rng.integers(1, 5, size=(B, Lt, 2)).astype(np.int32)
    text_length = np.asarray([Lt, Lt - 3][:B], np.int32)
    return text, text_length


def test_artifact_matches_task_path(am_task, tmp_path):
    """Export -> deserialize (cpu lowering) -> synthesize == the task's
    static-frame predict, trimmed per utterance."""
    out = str(tmp_path / "art")
    manifest = save_artifacts(
        am_task, out, batch_size=2, text_lengths=[8], max_frames=64,
        sample_rate=1600, platforms=("cpu",),
    )
    assert os.path.exists(os.path.join(out, manifest["modules"]["8"]))

    text, text_length = _batch()
    art = ExportedTTS(out)
    wavs_art = art.synthesize(text, text_length)

    am_task.static_max_frames = 64
    try:
        got = am_task.predict({"text": text, "text_length": text_length})
    finally:
        am_task.static_max_frames = None
    for w_art, w_task in zip(wavs_art, got["wav"]):
        w_task = np.asarray(w_task)
        assert w_art.shape == w_task.shape
        np.testing.assert_allclose(w_art, w_task, atol=1e-6)


def test_artifact_is_self_contained(am_task, tmp_path):
    """The artifact directory alone (manifest + .shlo) is enough: reload
    through a fresh ExportedTTS and check manifest metadata and the
    unknown-bucket guard."""
    out = str(tmp_path / "art2")
    save_artifacts(
        am_task, out, batch_size=2, text_lengths=[8, 16], max_frames=64,
        sample_rate=1600, platforms=("cpu",),
    )
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert m["sample_rate"] == 1600 and sorted(m["modules"]) == ["16", "8"]

    art = ExportedTTS(out)
    assert art.buckets == [8, 16]
    text, text_length = _batch(B=2, Lt=16)
    wavs = art.synthesize(text, text_length)
    assert all(np.isfinite(w).all() and w.ndim == 1 for w in wavs)
    with pytest.raises(ValueError, match="no exported module"):
        art.synthesize(np.zeros((2, 12, 2), np.int32), np.asarray([4, 4]))


def test_engine_serves_artifact(am_task, tmp_path):
    """BatchingEngine over an ExportedTTS artifact: same audio as over the
    live task in static-frame mode; streaming and reload fail cleanly."""
    from msmctts_tpu.serving import BatchingEngine

    out = str(tmp_path / "art3")
    save_artifacts(
        am_task, out, batch_size=4, text_lengths=[8, 16], max_frames=64,
        sample_rate=1600, platforms=("cpu",),
    )
    from msmctts_tpu.export import ExportedTTS

    art = ExportedTTS(out)
    text = "3_1 5_2 7_0 2_1"

    eng = BatchingEngine(
        art, sample_rate=1600, batch_size=art.batch_size,
        text_buckets=art.buckets, window_ms=0.0,
    ).start()
    try:
        wav_art = eng.synthesize(text, timeout=300)
        with pytest.raises(NotImplementedError, match="streaming"):
            list(eng.synthesize_stream(text, timeout=300))
        with pytest.raises(RuntimeError, match="immutable"):
            eng.reload({})
    finally:
        eng.stop()

    am_task.static_max_frames = 64
    eng = BatchingEngine(
        am_task, sample_rate=1600, batch_size=4,
        text_buckets=art.buckets, window_ms=0.0,
    ).start()
    try:
        wav_task = eng.synthesize(text, timeout=300)
    finally:
        eng.stop()
        am_task.static_max_frames = None
    np.testing.assert_allclose(wav_art, wav_task, atol=1e-6)


def test_int8_artifact_matches_task_path(am_task, tmp_path):
    """int8 export: the calibrated PTQ decoder freezes into the artifact
    and reproduces the task's --int8 static-frame path."""
    text, text_length = _batch()
    am_task.int8_decoder = True
    am_task.static_max_frames = 64
    try:
        want = am_task.predict(  # first call calibrates the act scales
            {"text": text, "text_length": text_length}
        )
        out = str(tmp_path / "art8")
        m = save_artifacts(
            am_task, out, batch_size=2, text_lengths=[8], max_frames=64,
            sample_rate=1600, platforms=("cpu",), int8=True,
        )
        assert m["int8"] is True
        art = ExportedTTS(out)
        wavs_art = art.synthesize(text, text_length)
        for w_art, w_task in zip(wavs_art, want["wav"]):
            w_task = np.asarray(w_task, np.float32)
            assert w_art.shape == w_task.shape
            np.testing.assert_allclose(w_art, w_task, atol=1e-6)
    finally:
        am_task.int8_decoder = False
        am_task.static_max_frames = None
        am_task._jit_cache.pop("int8", None)


def test_int8_export_requires_calibration(am_task, tmp_path):
    am_task.int8_decoder = True
    try:
        am_task._jit_cache.pop("int8", None)
        with pytest.raises(ValueError, match="calibrat"):
            save_artifacts(
                am_task, str(tmp_path / "x"), batch_size=2,
                text_lengths=[8], max_frames=64, sample_rate=1600,
                platforms=("cpu",), int8=True,
            )
    finally:
        am_task.int8_decoder = False
        am_task._jit_cache.pop("int8", None)
