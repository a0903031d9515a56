"""Training criterions as pure functions.

Reimplements the reference's loss stack:
  * ``QuantizerLoss`` (msmctts_trainer.py:39-71) — masked, length- and
    dim-normalized VQ commitment terms plus the prior-prediction loss dict.
  * ``DurationLoss`` (msmctts_trainer.py:12-36).
  * ``MelLoss`` (criterions/stft_loss.py:55-114) — HiFi-GAN log-mel L1.
  * ``MultiResolutionSTFTLoss`` (stft_loss.py:119-173) — spectral
    convergence + log-magnitude L1 averaged over resolutions.
  * LSGAN adversarial + feature-matching terms (msmctts_trainer.py:162-196).

Everything is float32 regardless of activation dtype.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from msmctts_tpu.ops.masking import sequence_mask
from msmctts_tpu.ops.stft import mel_spectrogram_hifigan, stft_magnitude


def masked_diff_loss(term, lengths):
    """sum over valid frames / sum(lengths) / feature_dim
    (msmctts_trainer.py:59-61)."""
    term = term.astype(jnp.float32)
    mask = sequence_mask(lengths, term.shape[1], dtype=jnp.float32)[..., None]
    denom = jnp.maximum(jnp.sum(lengths.astype(jnp.float32)), 1.0)
    return jnp.sum(term * mask) / denom / term.shape[2]


def quantizer_loss(encoder_diffs, encoder_lengths, decoder_diffs, lambda_vq=1.0, lambda_pr=1.0):
    """Returns (vq_loss scalar, metrics dict)."""
    metrics = {}
    vq = jnp.zeros((), jnp.float32)
    for i, (diff, length) in enumerate(zip(encoder_diffs, encoder_lengths)):
        term = masked_diff_loss(diff, length)
        metrics[f"latent_loss_{i}_0"] = term
        vq = vq + lambda_vq * term
    if decoder_diffs is not None:
        prior = decoder_diffs["total_loss"]
        vq = vq + lambda_pr * prior
        for k, v in decoder_diffs.items():
            if k != "total_loss":
                metrics[k] = v
    metrics["vq_loss"] = vq
    return vq, metrics


def frame_loss(pred_mel, target_mel, lengths):
    """Masked mel-reconstruction MSE (msmctts_trainer.py:139-146)."""
    sq = jnp.square(pred_mel.astype(jnp.float32) - target_mel.astype(jnp.float32))
    return masked_diff_loss(sq, lengths)


def duration_loss(dur_pred, dur_target, text_lengths):
    """Masked duration MSE normalized by total text length
    (msmctts_trainer.py:12-36)."""
    sq = jnp.square(dur_pred.astype(jnp.float32) - dur_target.astype(jnp.float32))
    mask = sequence_mask(text_lengths, sq.shape[1], dtype=jnp.float32)
    denom = jnp.maximum(jnp.sum(text_lengths.astype(jnp.float32)), 1.0)
    return jnp.sum(sq * mask) / denom


def mel_loss(pred_wav, target_wav, sample_rate, fft_size=None, hop_size=None, win_size=None, num_mels=128):
    """HiFi-GAN-style log-mel L1; defaults derived from the sample rate as
    in VQGANTrainer.__init__ (msmctts_trainer.py:102-107)."""
    win_size = win_size or sample_rate // 20
    hop_size = hop_size or sample_rate // 80
    fft_size = fft_size or (2048 if win_size > 1024 else 1024)
    p = mel_spectrogram_hifigan(pred_wav, sample_rate, fft_size, hop_size, win_size, num_mels)
    t = mel_spectrogram_hifigan(target_wav, sample_rate, fft_size, hop_size, win_size, num_mels)
    return jnp.mean(jnp.abs(p - t))


def stft_loss(
    pred_wav,
    target_wav,
    fft_size: int = 1024,
    win_size: int = 600,
    hop_size: int = 120,
    mel_scale: bool = False,
    sample_rate: int = 24000,
    num_mels: int = 80,
):
    """Single-resolution STFT loss: spectral convergence + log-magnitude
    L1, with an optional mel warp (reference STFTLoss,
    criterions/stft_loss.py:119-143). Returns {sc_loss, mag_loss}."""
    p = stft_magnitude(pred_wav, fft_size, hop_size, win_size)
    t = stft_magnitude(target_wav, fft_size, hop_size, win_size)
    if mel_scale:
        from msmctts_tpu.ops.stft import mel_filterbank

        fb = jnp.asarray(mel_filterbank(sample_rate, fft_size, num_mels))
        p = jnp.einsum("mf,bft->bmt", fb, p)
        t = jnp.einsum("mf,bft->bmt", fb, t)
    sc = jnp.linalg.norm(t - p) / jnp.maximum(jnp.linalg.norm(t), 1e-8)
    logp = jnp.log(jnp.clip(p, 1e-5, 10.0))
    logt = jnp.log(jnp.clip(t, 1e-5, 10.0))
    return {"sc_loss": sc, "mag_loss": jnp.mean(jnp.abs(logp - logt))}


def multi_resolution_stft_loss(
    pred_wav,
    target_wav,
    fft_sizes: Sequence[int] = (1024, 2048, 512),
    win_sizes: Sequence[int] = (600, 1200, 300),
    hop_sizes: Sequence[int] = (120, 240, 60),
):
    """Returns dict {sc_loss, mag_loss} averaged over resolutions."""
    sc, mag = [], []
    for n_fft, win, hop in zip(fft_sizes, win_sizes, hop_sizes):
        p = stft_magnitude(pred_wav, n_fft, hop, win)
        t = stft_magnitude(target_wav, n_fft, hop, win)
        sc.append(jnp.linalg.norm(t - p) / jnp.maximum(jnp.linalg.norm(t), 1e-8))
        logp = jnp.log(jnp.clip(p, 1e-5, 10.0))
        logt = jnp.log(jnp.clip(t, 1e-5, 10.0))
        mag.append(jnp.mean(jnp.abs(logp - logt)))
    n = len(sc)
    return {"sc_loss": sum(sc) / n, "mag_loss": sum(mag) / n}


def paired_disc_apply(disc, params, fake, real):
    """Apply a discriminator to the (fake, real) pair.

    The reference evaluates D separately on fake and real, twice per step
    (D update, then the generator pass against the updated D —
    /root/reference/msmctts/trainers/msmctts_trainer.py:162-183). A
    batched variant — ONE call on ``concat([fake, real])``, numerically
    identical since every sub-discriminator is per-sample — was tried and
    MEASURED SLOWER on the v5e: 3.26 vs 4.10 steps/s for the full GAN
    step (chained in-graph timing, batch 16, T=384; PARITY.md train-step
    budget). The narrow D convs are bandwidth-bound, so doubling their
    batch moves the same bytes while the 2B concat/split and worse
    tilings add cost. Two separate applies is the faster formulation and
    is what this runs.

    Returns ``(fake_scores, fake_fmaps, real_scores, real_fmaps)``.
    """
    fs, ff = disc.apply({"params": params}, fake)
    rs, rf = disc.apply({"params": params}, real)
    return fs, ff, rs, rf


def lsgan_d_loss(real_scores, fake_scores):
    """Sum over discriminators of MSE-to-1 (real) + MSE-to-0 (fake);
    float32 regardless of activation dtype."""
    real = sum(
        jnp.mean(jnp.square(s.astype(jnp.float32) - 1.0)) for s in real_scores
    )
    fake = sum(jnp.mean(jnp.square(s.astype(jnp.float32))) for s in fake_scores)
    return real, fake


def lsgan_g_loss(fake_scores):
    return sum(
        jnp.mean(jnp.square(s.astype(jnp.float32) - 1.0)) for s in fake_scores
    )


def feature_matching_loss(fake_feats, real_feats):
    total = jnp.zeros((), jnp.float32)
    for ff, rf in zip(fake_feats, real_feats):
        for f, r in zip(ff, rf):
            total = total + jnp.mean(
                jnp.abs(f.astype(jnp.float32) - r.astype(jnp.float32))
            )
    return total
