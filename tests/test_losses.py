"""Loss math parity vs torch reimplementations of the reference criteria
(criterions/stft_loss.py) and masked-normalization goldens."""

import jax.numpy as jnp
import numpy as np
import torch

from msmctts_tpu.ops.stft import mel_filterbank, mel_spectrogram_hifigan
from msmctts_tpu.training.losses import (
    duration_loss,
    frame_loss,
    masked_diff_loss,
    mel_loss,
    multi_resolution_stft_loss,
    stft_loss,
)


def torch_hifigan_logmel(wav, sr, n_fft, hop, win, n_mels):
    """The reference MelLoss spectrogram (stft_loss.py:80-110) built on
    torch.stft + the (separately validated) Slaney mel basis."""
    x = torch.from_numpy(wav)
    pad = (n_fft - hop) // 2
    x = torch.nn.functional.pad(x.unsqueeze(1), (pad, pad), mode="reflect")[:, 0]
    spec = torch.stft(
        x, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    mag = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-9)
    fb = torch.from_numpy(mel_filterbank(sr, n_fft, n_mels))
    mel = torch.matmul(fb, mag)
    return torch.log(torch.clamp(mel, min=1e-5))


def test_hifigan_logmel_matches_torch(rng):
    sr, n_fft, hop, win, n_mels = 1600, 256, 20, 80, 16
    wav = (rng.normal(size=(2, 1600)) * 0.3).astype(np.float32)
    mine = np.asarray(mel_spectrogram_hifigan(jnp.asarray(wav), sr, n_fft, hop, win, n_mels))
    ref = torch_hifigan_logmel(wav, sr, n_fft, hop, win, n_mels).numpy()
    np.testing.assert_allclose(mine, ref, rtol=1e-3, atol=2e-3)


def test_mel_loss_zero_for_identical(rng):
    wav = (rng.normal(size=(2, 1600)) * 0.3).astype(np.float32)
    assert float(mel_loss(jnp.asarray(wav), jnp.asarray(wav), 1600, 256, 20, 80, 16)) == 0.0


def test_mr_stft_loss_matches_torch(rng):
    """MultiResolutionSTFTLoss terms (stft_loss.py:146-173) vs a torch
    reimplementation."""
    a = (rng.normal(size=(2, 2048)) * 0.3).astype(np.float32)
    b = (rng.normal(size=(2, 2048)) * 0.3).astype(np.float32)
    ffts, wins, hops = (256, 512), (120, 240), (30, 60)
    mine = multi_resolution_stft_loss(
        jnp.asarray(a), jnp.asarray(b), ffts, wins, hops
    )

    sc_terms, mag_terms = [], []
    for n_fft, win, hop in zip(ffts, wins, hops):
        def m(x):
            s = torch.stft(
                torch.from_numpy(x), n_fft, hop_length=hop, win_length=win,
                window=torch.hann_window(win), center=True, pad_mode="reflect",
                return_complex=True,
            )
            return torch.sqrt(torch.clamp(s.real**2 + s.imag**2, min=1e-7))
        pa, pb = m(a), m(b)
        sc_terms.append(
            (torch.norm(pb - pa, p="fro") / torch.clamp(torch.norm(pb, p="fro"), min=1e-8)).item()
        )
        la = torch.log(torch.clamp(pa, 1e-5, 10.0))
        lb = torch.log(torch.clamp(pb, 1e-5, 10.0))
        mag_terms.append(torch.mean(torch.abs(la - lb)).item())

    np.testing.assert_allclose(float(mine["sc_loss"]), np.mean(sc_terms), rtol=5e-3)
    np.testing.assert_allclose(float(mine["mag_loss"]), np.mean(mag_terms), rtol=5e-3)


def test_single_stft_loss_consistency(rng):
    a = (rng.normal(size=(1, 1024)) * 0.3).astype(np.float32)
    b = a * 0.5
    out = stft_loss(jnp.asarray(a), jnp.asarray(b), 256, 128, 32)
    assert float(out["sc_loss"]) > 0 and float(out["mag_loss"]) > 0
    same = stft_loss(jnp.asarray(a), jnp.asarray(a), 256, 128, 32)
    assert float(same["sc_loss"]) < 1e-6


def test_masked_diff_loss_golden(rng):
    """sum over valid / sum(lengths) / dim (msmctts_trainer.py:59-61)."""
    x = rng.normal(size=(2, 6, 4)).astype(np.float32) ** 2
    lengths = np.array([6, 3], np.int32)
    got = float(masked_diff_loss(jnp.asarray(x), jnp.asarray(lengths)))
    want = (x[0].sum() + x[1, :3].sum()) / 9.0 / 4.0
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_frame_and_duration_losses(rng):
    p = rng.normal(size=(2, 5, 3)).astype(np.float32)
    t = rng.normal(size=(2, 5, 3)).astype(np.float32)
    lengths = np.array([5, 2], np.int32)
    got = float(frame_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(lengths)))
    sq = (p - t) ** 2
    want = (sq[0].sum() + sq[1, :2].sum()) / 7.0 / 3.0
    np.testing.assert_allclose(got, want, rtol=1e-5)

    dp = rng.normal(size=(2, 4)).astype(np.float32)
    dt = rng.normal(size=(2, 4)).astype(np.float32)
    tl = np.array([4, 2], np.int32)
    got = float(duration_loss(jnp.asarray(dp), jnp.asarray(dt), jnp.asarray(tl)))
    sq = (dp - dt) ** 2
    want = (sq[0].sum() + sq[1, :2].sum()) / 6.0
    np.testing.assert_allclose(got, want, rtol=1e-5)
