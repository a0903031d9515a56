"""Host-side feature extraction (numpy) matching the reference recipes.

Reimplements the CSMSC/LJSpeech mel pipeline
(examples/csmsc/scripts/audio/audio.py) without librosa: preemphasis,
center-padded reflect STFT, Slaney mel filterbank, 20*log10 amp-to-dB with
1e-5 floor, ref-level subtraction and symmetric [-max_abs, max_abs]
normalization — MCD parity against the reference depends on these exact
conventions (SURVEY.md 7, "Numeric parity").
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy import signal as sps

from msmctts_tpu.ops.stft import hann_window, mel_filterbank


@dataclass
class AudioConfig:
    num_mels: int = 80
    num_freq: int = 1025
    sample_rate: int = 24000
    frame_length_ms: float = 50.0
    frame_shift_ms: float = 12.5
    preemphasis: float = 0.97
    min_level_db: float = -100.0
    ref_level_db: float = 20.0
    max_abs_value: float = 4.0
    symmetric_specs: bool = True

    @property
    def n_fft(self) -> int:
        return (self.num_freq - 1) * 2

    @property
    def hop_length(self) -> int:
        return int(self.frame_shift_ms / 1000 * self.sample_rate)

    @property
    def win_length(self) -> int:
        return int(self.frame_length_ms / 1000 * self.sample_rate)


def preemphasis(x: np.ndarray, coef: float) -> np.ndarray:
    return sps.lfilter([1.0, -coef], [1.0], x)


def inv_preemphasis(x: np.ndarray, coef: float) -> np.ndarray:
    return sps.lfilter([1.0], [1.0, -coef], x)


def stft_np(y: np.ndarray, n_fft: int, hop: int, win: int) -> np.ndarray:
    """librosa-convention STFT: hann window center-padded to n_fft,
    reflect-padded signal, complex output [n_fft//2+1, frames]."""
    window = hann_window(win)
    if win < n_fft:
        lpad = (n_fft - win) // 2
        window = np.pad(window, (lpad, n_fft - win - lpad))
    y = np.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    frames = np.lib.stride_tricks.as_strided(
        y,
        shape=(n_frames, n_fft),
        strides=(y.strides[0] * hop, y.strides[0]),
    )
    return np.fft.rfft(frames * window[None, :], axis=-1).T


def _amp_to_db(x):
    return 20.0 * np.log10(np.maximum(1e-5, x))


def _db_to_amp(x):
    return np.power(10.0, x * 0.05)


def _normalize(S, cfg: AudioConfig):
    if cfg.symmetric_specs:
        return np.clip(
            2 * cfg.max_abs_value * ((S - cfg.min_level_db) / -cfg.min_level_db)
            - cfg.max_abs_value,
            -cfg.max_abs_value,
            cfg.max_abs_value,
        )
    return np.clip(
        cfg.max_abs_value * ((S - cfg.min_level_db) / -cfg.min_level_db),
        0,
        cfg.max_abs_value,
    )


def denormalize(S, cfg: AudioConfig):
    if cfg.symmetric_specs:
        return (
            np.clip(S, -cfg.max_abs_value, cfg.max_abs_value) + cfg.max_abs_value
        ) * -cfg.min_level_db / (2 * cfg.max_abs_value) + cfg.min_level_db
    return np.clip(S, 0, cfg.max_abs_value) * -cfg.min_level_db / cfg.max_abs_value + cfg.min_level_db


def melspectrogram(wav: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """wav [T] -> normalized mel [frames, num_mels] (transposed to
    time-major for the dataset layer)."""
    D = stft_np(preemphasis(wav, cfg.preemphasis), cfg.n_fft, cfg.hop_length, cfg.win_length)
    fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.num_mels)
    S = _amp_to_db(fb @ np.abs(D)) - cfg.ref_level_db
    return _normalize(S, cfg).T.astype(np.float32)


def spectrogram(wav: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    D = stft_np(preemphasis(wav, cfg.preemphasis), cfg.n_fft, cfg.hop_length, cfg.win_length)
    S = _amp_to_db(np.abs(D)) - cfg.ref_level_db
    return _normalize(S, cfg).T.astype(np.float32)


def mcd(mel_a: np.ndarray, mel_b: np.ndarray) -> float:
    """Mel-cepstral-distortion-style distance between two [T, M] log-mel
    sequences (frames aligned, dB domain), used by the benchmark parity
    check."""
    n = min(len(mel_a), len(mel_b))
    diff = np.asarray(mel_a[:n], np.float64) - np.asarray(mel_b[:n], np.float64)
    return float(np.mean(np.sqrt(np.sum(diff**2, axis=-1))) * (10.0 / np.log(10.0)) * np.sqrt(2.0))
