"""ISTFTGenerator (TPU-first fast decoder, models/hifigan.py) + the
inverse-STFT op it rides on (ops/stft.py istft_real_imag)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msmctts_tpu.models.hifigan import (
    HifiGANGenerator,
    ISTFTGenerator,
    generator_upsample_ratio,
)
from msmctts_tpu.ops.stft import istft_real_imag, stft_real_imag


@pytest.mark.parametrize(
    "n_fft,hop,win", [(40, 10, 40), (16, 4, 16), (1024, 300, 1024), (64, 16, 32)]
)
def test_istft_inverts_stft(n_fft, hop, win):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1200)).astype(np.float32)
    r, i = stft_real_imag(x, n_fft, hop, win, center=True)
    y = np.asarray(istft_real_imag(r, i, n_fft, hop, win, center=True))
    T = min(x.shape[1], y.shape[1])
    np.testing.assert_allclose(y[:, :T], x[:, :T], atol=5e-6)


def test_istft_gradients_flow():
    """The head trains through the iSTFT: gradients w.r.t. the spectral
    frames are finite and non-zero."""
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.normal(size=(1, 21, 12)).astype(np.float32))
    i = jnp.asarray(rng.normal(size=(1, 21, 12)).astype(np.float32))

    def loss(r, i):
        return jnp.sum(istft_real_imag(r, i, 40, 10, 40, center=False) ** 2)

    gr, gi = jax.grad(loss, argnums=(0, 1))(r, i)
    assert np.isfinite(gr).all() and np.isfinite(gi).all()
    assert float(jnp.abs(gr).max()) > 0 and float(jnp.abs(gi).max()) > 0


def _gen_cfg(istft=True):
    cfg = dict(
        resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]],
        upsample_rates=[2],
        upsample_kernel_sizes=[4],
        upsample_initial_channel=16,
        num_mels=8,
    )
    if istft:
        cfg.update(istft_hop=2, istft_n_fft=8)
    return cfg


def test_generator_output_shape_matches_hifigan():
    """Same [B, T*ratio, 1] contract as HifiGANGenerator so MSMC-VQ-GAN
    configs swap decoders freely."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 24, 8)).astype(np.float32)

    g8 = ISTFTGenerator(**_gen_cfg())
    v = g8.init(jax.random.PRNGKey(0), x)
    y = g8.apply(v, x)
    assert y.shape == (2, 24 * 2 * 2, 1)
    assert np.isfinite(np.asarray(y)).all()

    hifi = HifiGANGenerator(
        **{**_gen_cfg(istft=False), "upsample_rates": [2, 2],
           "upsample_kernel_sizes": [4, 4]}
    )
    vh = hifi.init(jax.random.PRNGKey(0), x)
    assert hifi.apply(vh, x).shape == y.shape


def test_upsample_ratio_helper():
    assert generator_upsample_ratio(
        {"upsample_rates": [6, 5, 5, 2]}
    ) == 300
    assert generator_upsample_ratio(
        {"_name": "ISTFTGenerator", "upsample_rates": [6, 5],
         "istft_hop": 10}
    ) == 300
    assert generator_upsample_ratio(
        {"upsample_rates": [2], "istft_hop": 2}
    ) == 4


def test_vqgan_with_istft_decoder_trains_and_infers(tmp_path):
    """Full integration: MSMC-VQ-GAN with decoder_config._name=
    ISTFTGenerator crosses warmup->GAN in the real trainer, checkpoints,
    and analysis-synthesis produces the right lengths."""
    from msmctts_tpu.config import component_kwargs
    from msmctts_tpu.registry import get_trainer
    from msmctts_tpu.tasks import build_task
    from msmctts_tpu.utils.checkpoint import find_latest_checkpoint, load_checkpoint
    from tests.tiny import tiny_ae_config, write_tiny_dataset

    corpus = str(tmp_path / "corpus")
    import os

    os.makedirs(corpus)
    write_tiny_dataset(corpus)
    cfg = tiny_ae_config(corpus)
    cfg["id"] = "tiny_ae_istft"
    cfg["task"]["autoencoder"]["decoder_config"] = {
        "_name": "ISTFTGenerator",
        "upsample_rates": [2],
        "upsample_kernel_sizes": [4],
        "upsample_initial_channel": 16,
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "istft_hop": 2,
        "istft_n_fft": 8,
    }
    task = build_task(cfg, mode="train")
    trainer = get_trainer("VQGANTrainer")(
        cfg, task, **component_kwargs(cfg.trainer)
    )
    trainer.train(max_steps=4, log_every=2)  # warmup->GAN flip at step 2

    ckpt = find_latest_checkpoint(cfg.save_checkpoint_dir)
    infer = build_task(cfg, mode="infer")
    infer.load_variables(load_checkpoint(ckpt)["state"])
    rng = np.random.default_rng(3)
    batch = {
        "mel": rng.normal(size=(2, 16, 8)).astype(np.float32),
        "mel_length": np.asarray([16, 12], np.int64),
    }
    out = infer.infer_step(batch)
    assert out["wav"][0].shape[0] == 16 * 4  # ratio 2*2
    assert out["wav"][1].shape[0] == 12 * 4
    for w in out["wav"]:
        assert np.isfinite(np.asarray(w)).all()

    # unsupported fast paths fail with clear guidance
    infer.int8_decoder = True
    with pytest.raises(NotImplementedError, match="HifiGANGenerator"):
        infer.infer_step(batch)
    infer.int8_decoder = False
    with pytest.raises(NotImplementedError, match="streaming"):
        infer._streaming_decoder(4)
