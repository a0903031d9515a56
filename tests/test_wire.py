"""Wire-format feed compression + background device prefetch (data/wire.py):
int16 PCM round-trip exactness, step-level numeric invariance, and the
prefetcher's ordering/error contracts."""

import numpy as np
import pytest

import jax

from msmctts_tpu.config import component_kwargs
from msmctts_tpu.data.loader import DataLoader
from msmctts_tpu.data.wire import DevicePrefetcher, decode_batch, encode_batch
from msmctts_tpu.parallel.mesh import make_mesh, pad_batch_to_devices, shard_batch
from msmctts_tpu.registry import get_trainer
from msmctts_tpu.tasks import build_task
from tests.tiny import tiny_ae_config, write_tiny_dataset


def test_int16_roundtrip_exact_for_pcm():
    """Anything loaded from 16-bit audio (k/32768 floats) survives the wire
    bit-exactly; arbitrary floats stay within half a quantization step."""
    pcm = np.random.default_rng(0).integers(-32768, 32768, size=(4, 256))
    wav = (pcm / 32768.0).astype(np.float32)
    enc = encode_batch({"wav": wav}, True)
    assert enc["wav"].dtype == np.int16
    dec = np.asarray(decode_batch({k: jax.numpy.asarray(v) for k, v in enc.items()})["wav"])
    np.testing.assert_array_equal(dec, wav)

    arb = np.random.default_rng(1).uniform(-1, 1, size=(4, 256)).astype(np.float32)
    dec2 = np.asarray(
        decode_batch(
            {k: jax.numpy.asarray(v) for k, v in encode_batch({"wav": arb}, True).items()}
        )["wav"]
    )
    assert np.max(np.abs(dec2 - arb)) <= 0.5 / 32768.0


def test_full_mode_bf16_features():
    mel = np.random.default_rng(2).normal(size=(2, 8, 4)).astype(np.float32)
    enc = encode_batch({"mel": mel, "mel_length": np.array([8, 8])}, "full")
    assert enc["mel"].dtype == jax.numpy.bfloat16
    dec = decode_batch({k: jax.numpy.asarray(v) for k, v in enc.items()})
    assert dec["mel"].dtype == jax.numpy.float32
    assert np.max(np.abs(np.asarray(dec["mel"]) - mel)) < 0.01
    # lengths are untouched (up to jax's default int width)
    np.testing.assert_array_equal(np.asarray(dec["mel_length"]), enc["mel_length"])


def test_decode_keyed_not_dtype_keyed():
    """Decoding is keyed on the (key, dtype) pairs encode_batch produces:
    a native int16/bfloat16 feature under any other key passes through
    untouched (ADVICE r2: dtype-alone keying would rescale token ids)."""
    tokens = np.arange(12, dtype=np.int16).reshape(3, 4)
    flags = np.ones((3,), np.float32).astype(jax.numpy.bfloat16)
    dec = decode_batch(
        {"tokens": jax.numpy.asarray(tokens), "flags": jax.numpy.asarray(flags)}
    )
    assert dec["tokens"].dtype == jax.numpy.int16
    np.testing.assert_array_equal(np.asarray(dec["tokens"]), tokens)
    assert dec["flags"].dtype == jax.numpy.bfloat16


def test_gan_step_invariant_under_wire(tmp_path):
    """A GAN train step on a wire-encoded batch equals the raw-batch step
    exactly when the waveform is PCM-sourced (wavs here are written/read as
    int16 by the tiny corpus)."""
    corpus = str(tmp_path / "c")
    write_tiny_dataset(corpus)
    config = tiny_ae_config(corpus)
    config["save_checkpoint_dir"] = corpus + "/ckpt_wire"
    task = build_task(config, mode="train")
    trainer = get_trainer("VQGANTrainer")(config, task, **component_kwargs(config.trainer))

    from msmctts_tpu.training.base_trainer import build_dataset_from_config

    dataset = build_dataset_from_config(config, training=True)
    batch = pad_batch_to_devices(
        next(iter(DataLoader(dataset, batch_size=4, num_workers=0))), trainer.n_devices
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    raw = shard_batch(batch, trainer.mesh)
    enc = shard_batch(encode_batch(batch, True), trainer.mesh)
    # jit donates the state; replicate it per call via a fresh init
    _, m_raw = trainer.train_step(state, raw, 3)  # GAN phase
    state2 = trainer.init_state(jax.random.PRNGKey(0), batch)
    _, m_enc = trainer.train_step(state2, enc, 3)
    for k in m_raw:
        assert float(m_raw[k]) == pytest.approx(float(m_enc[k]), abs=0.0), k


def test_device_prefetcher_order_and_errors():
    mesh = make_mesh()
    n = len(jax.devices())
    batches = [
        {"wav": np.full((2, 8), i / 32768.0, np.float32), "mel_length": np.array([8, 8])}
        for i in range(5)
    ]
    pf = DevicePrefetcher(iter(batches), mesh, n_devices=n, mode=True, depth=2)
    got = [next(pf) for _ in range(5)]
    for i, b in enumerate(got):
        assert b["wav"].dtype == jax.numpy.int16
        assert int(np.asarray(b["wav"])[0, 0]) == i
    with pytest.raises(StopIteration):
        next(pf)  # iterator exhausted -> worker ends; queue drains
    pf.close()

    def boom():
        yield batches[0]
        raise RuntimeError("loader died")

    pf2 = DevicePrefetcher(boom(), mesh, n_devices=n, mode=True, depth=2)
    next(pf2)
    with pytest.raises(RuntimeError, match="loader died"):
        next(pf2)
    pf2.close()
