#!/usr/bin/env python
"""Synthetic pseudo-SSL corpus for QS-TTS-scale training (aishell3 recipe
envelope: 16 kHz, 200-sample frameshift = 80 frames/s, 1024-dim "SSL"
embeddings — configs/synthesizer/msmc_vq_gan_hubertch_aishell3.yaml).

Reuses the CSMSC phone-conditioned harmonic generator (../../csmsc/scripts/
synthetic_corpus.py) at 16 kHz and derives the QS-TTS feature set per
utterance:

  emb/    [T, 1024] pseudo-SSL: a FIXED seeded random 2-layer tanh MLP
          over +-1-frame mel context — deterministic content features at
          the HuBERT layout (the real recipe's extract_ssl_hubert.py
          emits 1024-dim frames at the same 12.5 ms rate), so the
          MSMC-VQ codebooks have real structure to learn.
  pitch/  [T, 1] log(f0/150) of the generator's smoothed f0 curve,
          gated by voicing (amp>1e-3) — frame means.
  energy/ [T, 1] log1p(10*RMS) per frame.
  mel/    [T, 80] at the 16 kHz AudioConfig (mel_dim 80, pred_mel aux).
  wav/    16 kHz waveforms.
  phone.txt / dur.txt / train.list / valid.list / test_ae.yaml (emb+
  pitch+energy entries) / test_tts.yaml — same book formats as the CSMSC
  corpus so the NASyn predictor stage and as_mcd_sweep.py work unchanged.

Usage:
  python synthetic_emb_corpus.py --out /tmp/synembcorpus --n-utts 120 --n-valid 6
"""

import argparse
import importlib.util
import os
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, REPO)

from msmctts_tpu.data.datasets import save_wav  # noqa: E402
from msmctts_tpu.utils.audio import AudioConfig, melspectrogram  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "csmsc_synthetic_corpus",
    os.path.join(REPO, "examples/csmsc/scripts/synthetic_corpus.py"),
)
_csmsc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_csmsc)

EMB_DIM = 1024
_FEAT_SEED = 7


def pseudo_ssl(mel: np.ndarray, dim: int = EMB_DIM) -> np.ndarray:
    """Deterministic random featurizer: the SAME two tanh layers for every
    utterance (seeded), over +-1-frame mel context."""
    rng = np.random.default_rng(_FEAT_SEED)
    d_in = mel.shape[1] * 3
    w1 = rng.normal(size=(d_in, 512)).astype(np.float32) / np.sqrt(d_in)
    w2 = rng.normal(size=(512, dim)).astype(np.float32) / np.sqrt(512)
    pad = np.pad(mel, ((1, 1), (0, 0)), mode="edge")
    ctx = np.concatenate([pad[:-2], pad[1:-1], pad[2:]], axis=1)
    return np.tanh(ctx @ w1) @ w2


def frame_tracks(tracks: dict, frames: int, fs: int) -> tuple:
    """Sample-level {f0, amp} -> frame-level (pitch [T,1], energy [T,1])."""
    f0, amp = tracks["f0"], tracks["amp"]
    n = frames * fs
    f0 = np.pad(f0, (0, max(0, n - len(f0))))[:n].reshape(frames, fs)
    amp = np.pad(amp, (0, max(0, n - len(amp))))[:n].reshape(frames, fs)
    voiced = amp.mean(axis=1) > 1e-3
    pitch = np.where(voiced, np.log(np.maximum(f0.mean(axis=1), 1.0) / 150.0), 0.0)
    return pitch.astype(np.float32)[:, None], voiced


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-utts", type=int, default=120)
    p.add_argument("--n-valid", type=int, default=6)
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    cfg = AudioConfig(sample_rate=args.sample_rate)
    fs = cfg.hop_length  # 200 at 16 kHz
    rng = np.random.default_rng(args.seed)
    for sub in ("wav", "mel", "emb", "pitch", "energy"):
        os.makedirs(f"{args.out}/{sub}", exist_ok=True)

    ids, phone_book, dur_book, tts_cases = [], [], [], {}
    for i in range(args.n_utts + args.n_valid):
        uid = f"syn{i:04d}"
        wav, labels, durs, tracks = _csmsc.utterance(
            rng, args.sample_rate, return_tracks=True
        )
        mel = melspectrogram(wav, cfg)
        frames = min(len(mel), len(wav) // fs)
        mel, wav = mel[:frames], wav[: frames * fs]
        emb = pseudo_ssl(mel)
        pitch, _ = frame_tracks(tracks, frames, fs)
        rms = np.sqrt(np.mean(wav.reshape(frames, fs) ** 2, axis=1))
        energy = np.log1p(10.0 * rms).astype(np.float32)[:, None]

        np.save(f"{args.out}/mel/{uid}.npy", mel)
        np.save(f"{args.out}/emb/{uid}.npy", emb.astype(np.float32))
        np.save(f"{args.out}/pitch/{uid}.npy", pitch)
        np.save(f"{args.out}/energy/{uid}.npy", energy)
        save_wav(f"{args.out}/wav/{uid}.wav", wav, args.sample_rate)

        text = " ".join("_".join(map(str, lab)) for lab in labels)
        phone_book.append(f"{uid}|{text}")
        fdurs = _csmsc.frame_durations(durs, frames, args.sample_rate, fs)
        dur_book.append(f"{uid}|" + " ".join(str(d) for d in fdurs))
        tts_cases[uid] = (text, " ".join(str(d) for d in fdurs))
        ids.append(uid)

    train, valid = ids[: args.n_utts], ids[args.n_utts:]
    with open(f"{args.out}/train.list", "w") as f:
        f.write("\n".join(train) + "\n")
    with open(f"{args.out}/valid.list", "w") as f:
        f.write("\n".join(valid) + "\n")
    with open(f"{args.out}/phone.txt", "w") as f:
        f.write("\n".join(phone_book) + "\n")
    with open(f"{args.out}/dur.txt", "w") as f:
        f.write("\n".join(dur_book) + "\n")
    with open(f"{args.out}/test_ae.yaml", "w") as f:
        for uid in valid:
            f.write(
                f"{uid}:\n"
                f"  emb: {args.out}/emb/{uid}.npy\n"
                f"  pitch: {args.out}/pitch/{uid}.npy\n"
                f"  energy: {args.out}/energy/{uid}.npy\n"
            )
    with open(f"{args.out}/test_tts.yaml", "w") as f:
        for uid in valid:
            text, fdur = tts_cases[uid]
            f.write(f'{uid}:\n  text: "{text}"\n  dur: "{fdur}"\n')
    print(f"wrote {len(train)} train + {len(valid)} valid utts to {args.out}")


if __name__ == "__main__":
    main()
