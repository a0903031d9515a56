#!/usr/bin/env python
"""Learnable synthetic corpus for end-to-end smoke training + MCD trending.

Generates harmonic utterances (random slow f0 contours, per-harmonic
amplitudes, amplitude envelope, light noise floor) at the CSMSC recipe's
audio format (24 kHz, 80 mel, 300-sample frameshift) with mels extracted by
the framework's recipe-parity extractor — so a full-size MSMC-VQ-GAN can be
trained end-to-end without real data and `evaluate_mcd.py` produces a
meaningful, falling number as training progresses (the reference's quality
checks are recipe-level listening tests on real corpora, SURVEY.md 4; this
is the data-free CI equivalent).

Usage:
  python synthetic_corpus.py --out /tmp/syncorpus --n-utts 120 --n-valid 6
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from msmctts_tpu.data.datasets import save_wav  # noqa: E402
from msmctts_tpu.utils.audio import AudioConfig, melspectrogram  # noqa: E402


def harmonic_utterance(rng, sr: int, seconds: float) -> np.ndarray:
    n = int(seconds * sr)
    t = np.arange(n) / sr
    # slow random-walk f0 contour in [110, 320] Hz
    n_ctrl = max(4, int(seconds * 3))
    ctrl = rng.uniform(110.0, 320.0, size=n_ctrl)
    f0 = np.interp(np.linspace(0, n_ctrl - 1, n), np.arange(n_ctrl), ctrl)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    n_harm = int(rng.integers(4, 10))
    amps = rng.uniform(0.2, 1.0, size=n_harm) / np.arange(1, n_harm + 1)
    wav = np.zeros(n)
    for h, a in enumerate(amps, start=1):
        wav += a * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    # amplitude envelope (syllable-ish 2-6 Hz modulation) + noise floor
    n_env = max(4, int(seconds * rng.uniform(2, 6)))
    env_ctrl = rng.uniform(0.15, 1.0, size=n_env)
    env = np.interp(np.linspace(0, n_env - 1, n), np.arange(n_env), env_ctrl)
    wav = wav * env + rng.normal(size=n) * 0.003
    wav = wav / np.max(np.abs(wav)) * 10 ** (-7.0 / 20.0)  # recipe -7 dBFS
    return wav.astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-utts", type=int, default=120)
    p.add_argument("--n-valid", type=int, default=6)
    p.add_argument("--min-seconds", type=float, default=2.0)
    p.add_argument("--max-seconds", type=float, default=5.0)
    p.add_argument("--sample-rate", type=int, default=24000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    cfg = AudioConfig(sample_rate=args.sample_rate)
    fs = cfg.hop_length
    rng = np.random.default_rng(args.seed)
    os.makedirs(f"{args.out}/wav", exist_ok=True)
    os.makedirs(f"{args.out}/mel", exist_ok=True)

    ids = []
    for i in range(args.n_utts + args.n_valid):
        uid = f"syn{i:04d}"
        seconds = rng.uniform(args.min_seconds, args.max_seconds)
        wav = harmonic_utterance(rng, args.sample_rate, seconds)
        mel = melspectrogram(wav, cfg)
        frames = min(len(mel), len(wav) // fs)
        mel, wav = mel[:frames], wav[: frames * fs]
        np.save(f"{args.out}/mel/{uid}.npy", mel)
        save_wav(f"{args.out}/wav/{uid}.wav", wav, args.sample_rate)
        ids.append(uid)

    train, valid = ids[: args.n_utts], ids[args.n_utts :]
    with open(f"{args.out}/train.list", "w") as f:
        f.write("\n".join(train) + "\n")
    with open(f"{args.out}/valid.list", "w") as f:
        f.write("\n".join(valid) + "\n")
    # analysis-synthesis testlist (reference test_ae.yaml shape)
    with open(f"{args.out}/test_ae.yaml", "w") as f:
        for uid in valid:
            f.write(f"{uid}:\n  mel: {args.out}/mel/{uid}.npy\n")
    print(f"wrote {len(train)} train + {len(valid)} valid utts to {args.out}")


if __name__ == "__main__":
    main()
