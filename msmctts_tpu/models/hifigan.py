"""HiFi-GAN generator + UnivNet-style discriminators (TPU/JAX).

Generator mirrors the reference architecture (hifigan/generator.py:10-64):
weight-normed conv_pre(7) -> per-stage [transposed upsample + MRF resblock
sum / num_kernels] -> leaky_relu -> conv_post(7) -> tanh, all in NLC layout
so channels ride the TPU lane dim and the transposed convs lower to MXU
matmuls via lhs dilation.

Discriminators (hifigan/discriminator.py):
  * MultiResolutionDiscriminator — per hop length an STFT (fft=4*hop,
    normalized, HTK mel warp, 'double' domain: stacked linear+log mags as a
    2-channel image) feeding 7 weight-normed 3x3 conv2d stages.
  * MultiPeriodDiscriminator — waveform reshaped [B, T/p, p, 1] per period,
    5 strided (k,1) conv2d stages + post conv.

The reference's reflection pads become explicit jnp.pad calls; LeakyReLU
slopes follow the reference (0.1 generator, 0.2 discriminators).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from msmctts_tpu.ops.convs import WNConv, WNConvTranspose1d
from msmctts_tpu.ops.stft import mel_filterbank_htk, stft_real_imag
from msmctts_tpu.registry import register_network

GEN_LRELU = 0.1
DISC_LRELU = 0.2


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def receptive_field_frames(decoder_config) -> int:
    """Conservative one-sided receptive-field radius of HifiGANGenerator,
    in input-frame units.

    Any output sample depends only on input frames within this radius, so a
    chunk decoded with this much context on each side reproduces the
    monolithic decode exactly in its interior (the streaming-decode
    contract, msmctts_tpu/streaming.py; equality tested in
    tests/test_streaming.py). Every conversion rounds up.
    """
    import math

    rates = list(decoder_config["upsample_rates"])
    ks = list(decoder_config["upsample_kernel_sizes"])
    rks = list(decoder_config["resblock_kernel_sizes"])
    rds = list(decoder_config["resblock_dilation_sizes"])
    # MRF radius in stage-output units: within ResBlock1 each dilation d
    # applies conv(k, d) then conv(k, 1) sequentially (radii add through
    # the residual chain); parallel kernels take the max.
    mrf = max(
        sum((k - 1) * d // 2 + (k - 1) // 2 for d in dil)
        for k, dil in zip(rks, rds)
    )
    r = 3.0  # conv_pre, k=7
    cum = 1.0
    for u, k in zip(rates, ks):
        r += math.ceil(k / u) / cum  # transposed-conv input window
        cum *= u
        r += mrf / cum
    r += 3.0 / cum  # conv_post, k=7 (output-sample units)
    return int(math.ceil(r)) + 1  # slack for window-floor effects


class ResBlock1(nn.Module):
    """MRF residual block (hifigan/common.py:21-58)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, GEN_LRELU)
            xt = WNConv(
                self.channels,
                (self.kernel_size,),
                padding=_get_padding(self.kernel_size, d),
                dilation=d,
                hifigan_init=True,
                name=f"conv1_{i}",
            )(xt)
            xt = nn.leaky_relu(xt, GEN_LRELU)
            xt = WNConv(
                self.channels,
                (self.kernel_size,),
                padding=_get_padding(self.kernel_size, 1),
                hifigan_init=True,
                name=f"conv2_{i}",
            )(xt)
            x = x + xt
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, GEN_LRELU)
            xt = WNConv(
                self.channels,
                (self.kernel_size,),
                padding=_get_padding(self.kernel_size, d),
                dilation=d,
                hifigan_init=True,
                name=f"conv_{i}",
            )(xt)
            x = x + xt
        return x


@register_network("HifiGANGenerator")
class HifiGANGenerator(nn.Module):
    """[B, T, num_mels] -> [B, T * prod(upsample_rates), 1] waveform."""

    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    num_mels: int = 80

    @nn.compact
    def __call__(self, x):
        num_kernels = len(self.resblock_kernel_sizes)
        x = WNConv(self.upsample_initial_channel, (7,), padding=3, name="conv_pre")(x)
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, GEN_LRELU)
            x = WNConvTranspose1d(
                ch, k, u, padding=(k - u) // 2, hifigan_init=True, name=f"up_{i}"
            )(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                r = ResBlock1(ch, rk, tuple(rd), name=f"resblock_{i}_{j}")(x)
                acc = r if acc is None else acc + r
            x = acc / num_kernels
        # the reference's final activation is F.leaky_relu(x) with the torch
        # DEFAULT slope 0.01, not LRELU_SLOPE (generator.py:52)
        x = nn.leaky_relu(x, 0.01)
        x = WNConv(1, (7,), padding=3, hifigan_init=True, name="conv_post")(x)
        return jnp.tanh(x)


@register_network("MSGenerator")
class MSGenerator(nn.Module):
    """Speaker-conditioned HiFi-GAN: a global speaker embedding is
    broadcast over time and concatenated to the mel input before the
    standard generator stack. The reference's version is unusable (its
    ``super(Generator, ...)`` call skips its own __init__,
    hifigan/generator.py:67-128); this is the working equivalent."""

    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    num_mels: int = 80
    spk_dim: int = 256

    @nn.compact
    def __call__(self, x, spk):
        """x [B, T, num_mels], spk [B, spk_dim] -> [B, T*prod(rates), 1]."""
        spk_t = jnp.broadcast_to(
            spk[:, None, :], (x.shape[0], x.shape[1], spk.shape[-1])
        ).astype(x.dtype)
        x = jnp.concatenate([x, spk_t], axis=-1)
        return HifiGANGenerator(
            resblock_kernel_sizes=self.resblock_kernel_sizes,
            resblock_dilation_sizes=self.resblock_dilation_sizes,
            upsample_rates=self.upsample_rates,
            upsample_initial_channel=self.upsample_initial_channel,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            num_mels=self.num_mels + self.spk_dim,
            name="generator",
        )(x)


class DiscriminatorR(nn.Module):
    """7-stage 3x3 conv2d spectrogram discriminator with reflection padding
    (discriminator.py:15-76). Input [B, F, T, C]; returns (score, fmaps[:-1])."""

    hidden_channels: int = 512

    @nn.compact
    def __call__(self, x):
        hc = self.hidden_channels
        plan = [  # (features, stride)
            (hc // 32, 1),
            (hc // 16, 2),
            (hc // 8, 1),
            (hc // 4, 2),
            (hc // 2, 1),
            (hc, 2),
            (1, 1),
        ]
        fmaps = []
        for i, (feat, stride) in enumerate(plan):
            if i > 0:
                x = nn.leaky_relu(x, DISC_LRELU)
                # the reference's LeakyReLU(0.2, inplace=True) mutates the
                # stored hidden of the PREVIOUS conv, so the fmaps its FM
                # loss consumes are post-activation (discriminator.py:27-76;
                # verified by transplant in test_reference_parity) — unlike
                # DiscriminatorP, whose functional lrelu is out-of-place
                fmaps.append(x)
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            x = WNConv(feat, (3, 3), strides=stride, name=f"conv_{i}")(x)
        return x, fmaps


class MultiResolutionDiscriminator(nn.Module):
    """Two config surfaces coexist in the reference recipes:
    ``hop_lengths``/``hidden_channels`` (fft = 4*hop, CSMSC recipe,
    discriminator.py:102-116) and ``resolutions`` [[n_fft, hop, win], ...]
    with a shared ``channels`` (QS-TTS recipe yaml) — both supported."""

    hop_lengths: Sequence[int] = (15, 30, 50, 120, 240, 480)
    hidden_channels: Sequence[int] = (128, 128, 256, 256, 512, 512)
    resolutions: Optional[Sequence[Sequence[int]]] = None
    channels: Optional[int] = None
    domain: str = "double"
    mel_scale: bool = True
    sample_rate: int = 24000
    ref_level_db: float = 20.0
    min_level_db: float = -100.0

    @nn.compact
    def __call__(self, wav):
        """wav [B, T] -> (scores list, fmaps list-of-lists)."""
        if self.resolutions is not None:
            plans = [
                (n_fft, hop, win, self.channels or 512)
                for (n_fft, hop, win) in self.resolutions
            ]
        else:
            plans = [
                (hop * 4, hop, hop * 4, hc)
                for hop, hc in zip(self.hop_lengths, self.hidden_channels)
            ]
        scores, fmaps = [], []
        for idx, (n_fft, hop, win, hc) in enumerate(plans):
            real, imag = stft_real_imag(
                wav, n_fft, hop, win, center=True, normalized=True
            )
            mag = jnp.sqrt(jnp.clip(real * real + imag * imag, min=1e-7))
            if self.mel_scale:
                n_bins = n_fft // 2 + 1
                fb = jnp.asarray(
                    mel_filterbank_htk(
                        n_bins, 0.0, self.sample_rate / 2, n_bins, self.sample_rate
                    )
                )
                mag = jnp.einsum("bft,fm->bmt", mag, fb)
            if self.domain == "double":
                log_mag = 20.0 * jnp.log10(mag) - self.ref_level_db
                log_mag = jnp.clip(
                    (log_mag - self.min_level_db) / -self.min_level_db, 0.0, 1.0
                )
                img = jnp.stack([mag, log_mag], axis=-1)  # [B, F, T', 2]
            else:
                img = mag[..., None]
            score, fmap = DiscriminatorR(hc, name=f"disc_{idx}")(img)
            scores.append(score)
            fmaps.append(fmap)
        return scores, fmaps


class DiscriminatorP(nn.Module):
    """Period discriminator (discriminator.py:119-152); input [B, T]."""

    period: int
    channels: int = 32
    max_channels: int = 1024
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, wav):
        B, T = wav.shape
        p = self.period
        if T % p != 0:
            n_pad = p - (T % p)
            wav = jnp.pad(wav, ((0, 0), (0, n_pad)), mode="reflect")
            T = T + n_pad
        x = wav.reshape(B, T // p, p, 1)  # [B, T/p, p, 1] NHWC

        ch = self.channels
        chans = [ch, ch * 4, min(self.max_channels, ch * 16), min(self.max_channels, ch * 32)]
        pad = _get_padding(self.kernel_size, 1)
        fmaps = []
        for i, c in enumerate(chans + [chans[-1]]):
            k = (self.kernel_size, 1) if i < 4 else (5, 1)
            s = (self.stride, 1) if i < 4 else (1, 1)
            pd = [(pad, pad), (0, 0)] if i < 4 else [(2, 2), (0, 0)]
            x = WNConv(c, k, strides=s, padding=pd, name=f"conv_{i}")(x)
            fmaps.append(x)
            x = nn.leaky_relu(x, DISC_LRELU)
        x = WNConv(1, (3, 1), padding=[(1, 1), (0, 0)], name="conv_post")(x)
        score = x.reshape(B, -1)
        return score, fmaps


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channels: int = 32
    max_channels: int = 1024

    @nn.compact
    def __call__(self, wav):
        scores, fmaps = [], []
        for p in self.periods:
            s, f = DiscriminatorP(p, self.channels, self.max_channels, name=f"disc_p{p}")(wav)
            scores.append(s)
            fmaps.append(f)
        return scores, fmaps


@register_network("UnivNetDiscriminator")
class UnivNetDiscriminator(nn.Module):
    """MRD + MPD combined (discriminator.py:174-190). Input [B, T] or
    [B, T, 1]; returns concatenated (scores, fmaps)."""

    mrd_config: dict
    mpd_config: dict

    @nn.compact
    def __call__(self, wav):
        if wav.ndim == 3:
            wav = wav[..., 0]
        mrd_s, mrd_f = MultiResolutionDiscriminator(**self.mrd_config, name="mrd")(wav)
        mpd_s, mpd_f = MultiPeriodDiscriminator(**self.mpd_config, name="mpd")(wav)
        return mrd_s + mpd_s, mrd_f + mpd_f


@register_network("ISTFTGenerator")
class ISTFTGenerator(nn.Module):
    """HiFi-GAN trunk + inverse-STFT head (iSTFTNet arXiv:2203.02395 /
    WaveNeXt-style; no reference counterpart — a TPU-first fast decoder).

    On v5e the tail HiFi-GAN stages are lane-starved: once channels fall
    below the 128-lane register width, MXU utilization drops to ~39%
    (C=64) and the last x5 x2 upsamplings dominate decode time
    (PARITY.md 2.12). This variant keeps the wide trunk stages and
    replaces the tail with a spectral projection + ``istft_real_imag``
    (ops/stft.py) — the final x``istft_hop`` upsampling becomes one
    [2*(n_fft//2+1)] -> [n_fft] matmul per frame that the MXU runs dense.

    Total upsampling = prod(upsample_rates) * istft_hop; for the CSMSC
    x300 recipe use e.g. rates [6, 5] with istft_hop 10, istft_n_fft 40.
    Output length matches ``HifiGANGenerator`` exactly ([B, T*ratio, 1]),
    so MSMC-VQ-GAN configs can swap decoders via ``decoder_config._name``.
    """

    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    istft_hop: int = 10
    istft_n_fft: int = 40
    num_mels: int = 80

    @nn.compact
    def __call__(self, x):
        from msmctts_tpu.ops.stft import istft_real_imag

        num_kernels = len(self.resblock_kernel_sizes)
        x = WNConv(self.upsample_initial_channel, (7,), padding=3, name="conv_pre")(x)
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, GEN_LRELU)
            x = WNConvTranspose1d(
                ch, k, u, padding=(k - u) // 2, hifigan_init=True, name=f"up_{i}"
            )(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                r = ResBlock1(ch, rk, tuple(rd), name=f"resblock_{i}_{j}")(x)
                acc = r if acc is None else acc + r
            x = acc / num_kernels
        x = nn.leaky_relu(x, 0.01)
        n_bins = self.istft_n_fft // 2 + 1
        # spectral head: log-magnitude + phase angle per bin
        spec = WNConv(2 * n_bins, (7,), padding=3, hifigan_init=True,
                      name="conv_post")(x)
        logmag, phase = spec[..., :n_bins], spec[..., n_bins:]
        mag = jnp.exp(jnp.clip(logmag, -11.5, 4.0))  # bounded away from inf
        real = (mag * jnp.cos(phase)).swapaxes(1, 2)  # [B, bins, frames]
        imag = (mag * jnp.sin(phase)).swapaxes(1, 2)
        wav = istft_real_imag(
            real, imag, self.istft_n_fft, self.istft_hop, self.istft_n_fft,
            center=False,
        )
        # center=False synthesis emits (F-1)*hop + n_fft samples; trim the
        # window tails symmetrically to exactly F*hop (one-sided lead of
        # (n_fft-hop)//2, mirroring mel_spectrogram_hifigan's analysis pad)
        lead = (self.istft_n_fft - self.istft_hop) // 2
        total = real.shape[-1] * self.istft_hop
        wav = wav[:, lead : lead + total]
        # no tanh: the spectral head bounds the signal through the
        # magnitude clip (iSTFTNet leaves the iSTFT output raw)
        return wav[..., None]


def generator_upsample_ratio(decoder_config) -> int:
    """Samples per input frame for a decoder_config, decoder-family aware:
    prod(upsample_rates), times ``istft_hop`` for the ISTFTGenerator head."""
    import math

    ratio = math.prod(int(u) for u in decoder_config["upsample_rates"])
    if decoder_config.get("_name") == "ISTFTGenerator" or "istft_hop" in decoder_config:
        ratio *= int(decoder_config.get("istft_hop", 10))
    return ratio
