"""STFT and mel filterbank ops.

JAX STFT is implemented as a strided convolution against a windowed DFT
basis — a framed matmul that maps onto the TPU MXU, replacing the
reference's cuFFT-backed ``torch.stft`` (criterions/stft_loss.py:22,
utils/audio.py:379-426).

Two mel filterbank conventions coexist in the reference and both are
reimplemented here from their published formulas:
  * ``mel_filterbank(htk=False, norm='slaney')`` — librosa-style Slaney
    mel, used by the recipe feature extraction
    (examples/csmsc/scripts/audio/audio.py:113) and by ``MelLoss``
    (criterions/stft_loss.py:86);
  * ``mel_filterbank_htk`` — the torchaudio-style HTK matrix used by the
    MRD discriminator's mel warp (utils/audio.py:30-84).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Windows / filterbanks (host-side numpy; baked into jit as constants)
# ---------------------------------------------------------------------------


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window / fftbins=True)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _hz_to_mel(f, htk: bool):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney scale: linear below 1 kHz, log above.
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels
    )


def _mel_to_hz(m, htk: bool):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
) -> np.ndarray:
    """[n_mels, n_fft//2+1] triangular filterbank (librosa convention)."""
    if fmax is None:
        fmax = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # [n_mels+2, n_freqs]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        fb *= enorm[:, None]
    return fb.astype(np.float32)


def mel_filterbank_htk(n_freqs: int, f_min: float, f_max: float, n_mels: int, sample_rate: int) -> np.ndarray:
    """[n_freqs, n_mels] HTK-mel matrix matching the reference's vendored
    torchaudio ``create_fb_matrix`` (utils/audio.py:30-84): linspace over
    0..sr//2, clamp(1e-6, 1), no area normalization."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = 2595.0 * np.log10(1.0 + f_min / 700.0)
    m_max = 2595.0 * np.log10(1.0 + f_max / 700.0)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.clip(np.minimum(down, up), 1e-6, 1.0)
    return fb.astype(np.float32)


# ---------------------------------------------------------------------------
# JAX STFT as a framed-matmul convolution
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _dft_kernels(n_fft: int, win_length: int) -> np.ndarray:
    """Conv kernels [2*(n_fft//2+1), 1, n_fft]: windowed cos rows then
    -sin rows; correlating a frame with row k gives Re/Im of DFT bin k."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[None, :]
    k = np.arange(n_bins)[:, None]
    angle = 2.0 * np.pi * k * t / n_fft
    window = hann_window(win_length)
    if win_length < n_fft:  # center-pad window to n_fft (librosa/torch)
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=0)
    return (basis * window[None, :]).astype(np.float32)[:, None, :]


def stft_real_imag(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    normalized: bool = False,
):
    """Real/imag STFT of [B, T] -> each [B, n_fft//2+1, frames].

    Matches torch.stft conventions: hann window center-padded to n_fft,
    reflect padding of n_fft//2 when ``center``; ``normalized`` divides by
    sqrt(n_fft).
    """
    kern = jnp.asarray(_dft_kernels(n_fft, win_length))
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    # [B, 1, T] conv [out=2*bins, in=1, n_fft] stride hop -> [B, 2*bins, frames]
    out = jax.lax.conv_general_dilated(
        x[:, None, :].astype(jnp.float32),
        kern,
        window_strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,  # loss-grade accuracy, not bf16
    )
    n_bins = n_fft // 2 + 1
    real, imag = out[:, :n_bins], out[:, n_bins:]
    if normalized:
        scale = 1.0 / np.sqrt(n_fft)
        real, imag = real * scale, imag * scale
    return real, imag


def stft_magnitude(x, n_fft, hop_length, win_length, center=True, normalized=False, eps=1e-7):
    real, imag = stft_real_imag(x, n_fft, hop_length, win_length, center, normalized)
    return jnp.sqrt(jnp.clip(real * real + imag * imag, min=eps))


def mel_spectrogram_hifigan(
    wav: jax.Array,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_mels: int,
    eps: float = 1e-9,
    clip_val: float = 1e-5,
):
    """HiFi-GAN-style log-mel used by ``MelLoss`` (stft_loss.py:80-110):
    reflect pad (n_fft-hop)/2 both sides, center=False STFT, slaney mel,
    log(clamp(., 1e-5))."""
    pad = (n_fft - hop_length) // 2
    wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    real, imag = stft_real_imag(wav, n_fft, hop_length, win_length, center=False)
    mag = jnp.sqrt(real * real + imag * imag + eps)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    mel = jnp.einsum("mf,bft->bmt", fb, mag)
    return jnp.log(jnp.clip(mel, min=clip_val))


def _idft_kernels(n_fft: int, win_length: int) -> np.ndarray:
    """Synthesis kernels [2*(n_fft//2+1), 1, n_fft] inverting
    ``_dft_kernels``: row k of the cos block reconstructs
    w_k/n_fft * cos(2*pi*k*t/n_fft) (hermitian fold: w_k=2 except DC and
    Nyquist), the sin block the matching -sin — so transposed-convolving
    (real, -imag-convention imag) frames with these and overlap-adding
    yields the windowed time frames."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[None, :]
    k = np.arange(n_bins)[:, None]
    angle = 2.0 * np.pi * k * t / n_fft
    weights = np.full((n_bins, 1), 2.0)
    weights[0] = 1.0
    if n_fft % 2 == 0:
        weights[-1] = 1.0
    window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    basis = np.concatenate(
        [weights * np.cos(angle), -weights * np.sin(angle)], axis=0
    ) / float(n_fft)
    return (basis * window[None, :]).astype(np.float32)[:, None, :]


def istft_real_imag(
    real: jax.Array,
    imag: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    eps: float = 1e-9,
):
    """Inverse of ``stft_real_imag`` (same torch conventions: hann,
    -sin imag): [B, n_fft//2+1, frames] x2 -> [B, T] with
    T = (frames-1)*hop (center) — least-squares overlap-add with
    window-square normalization.

    TPU-first: synthesis is ONE transposed conv of the spectral frames
    with the windowed (i)DFT basis (an MXU matmul per frame) plus a tiny
    transposed conv for the normalizer — no scatter, no host loop. This
    is what makes the iSTFT-head generator fast: the x``hop`` upsampling
    costs a [2*bins -> n_fft] matmul instead of lane-starved small-channel
    convolutions (models/hifigan.py ISTFTGenerator)."""
    kern = jnp.asarray(_idft_kernels(n_fft, win_length))
    frames = jnp.concatenate([real, imag], axis=1).astype(jnp.float32)
    # [B, 2*bins, F] -(conv_transpose stride hop)-> [B, 1, (F-1)*hop+n_fft]
    x = jax.lax.conv_transpose(
        frames,
        kern,
        strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        transpose_kernel=True,
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0]
    # window-square overlap-add normalizer over the same frame grid
    window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    wsq = jnp.asarray((window * window).astype(np.float32))[None, None, :]
    ones = jnp.ones((1, 1, real.shape[-1]), jnp.float32)
    norm = jax.lax.conv_transpose(
        ones,
        wsq,
        strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        transpose_kernel=True,
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0]
    x = x / jnp.maximum(norm, eps)
    if center:
        half = n_fft // 2
        x = x[:, half : x.shape[1] - half]
    return x
