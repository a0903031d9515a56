#!/usr/bin/env python
"""Learnable synthetic corpus for end-to-end smoke training + MCD trending.

Generates PHONE-CONDITIONED harmonic utterances at the CSMSC recipe's audio
format (24 kHz, 80 mel, 300-sample frameshift): each utterance is a sequence
of CSMSC symbols (msmctts_tpu/utils/text.py inventory) where every symbol id
deterministically maps to acoustic properties (base f0, harmonic profile,
level), tone scales f0, and the erhua flag tilts the spectrum — so BOTH
recipe stages are trainable without real data:

  * MSMC-VQ-GAN on the wav/mel pairs (analysis-synthesis MCD trend), and
  * the MultiStagePredictor acoustic model on the phone/dur books
    (text -> waveform TTS MCD with given durations). Durations are
    phone-conditioned too (per-symbol base x tone stretch x +-10% jitter),
    so the duration predictor is learnable and held-out sentences
    transfer — the r2 corpus's fully random durations limited stage-2
    evaluation to training sentences.

Emitted layout (reference examples/csmsc/scripts/preprocess outputs,
SURVEY.md 2.11):
  wav/ mel/ train.list valid.list test_ae.yaml
  phone.txt  'uid|id_tone_er ...'   (parse_textgrid.py payload format)
  dur.txt    'uid|frames ...'       (frame units: at 80 frames/s the
                                     reference's seconds->frames heuristic
                                     — tts_dataset.py:40, ratio > 100 —
                                     cannot trigger, so CSMSC-rate books
                                     must carry frames; sums match each
                                     utterance's mel exactly)
  test_tts.yaml  id -> {text, dur(frames)}  forced-duration TTS eval list
                 (frame durations sum exactly to the utterance's mel frames
                 so evaluate_mcd.py's truncation alignment is valid)

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
from msmctts_tpu.utils.text import SPOKEN, UNSPOKEN  # noqa: E402

N_HARM = 8
TONE_F0_SCALE = {0: 1.0, 1: 0.85, 2: 1.0, 3: 1.12, 4: 1.28, 5: 0.93}
SIL_ID = 1  # 'sil' in the inventory


def phone_params(pid: int) -> dict:
    """Deterministic per-symbol acoustics (seeded by the symbol id)."""
    rng = np.random.default_rng(1000 + pid)
    return {
        "f0": float(np.exp(rng.uniform(np.log(120.0), np.log(290.0)))),
        "harm": rng.uniform(0.15, 1.0, size=N_HARM) / np.arange(1, N_HARM + 1),
        "amp": float(rng.uniform(0.35, 1.0)),
        # base duration is a FUNCTION OF THE SYMBOL (+-10% utterance jitter
        # in `utterance`) so the duration predictor has something learnable
        # and held-out sentences transfer; fully random per-utterance
        # durations made the r2 corpus memorization-only for stage 2
        "dur": float(rng.uniform(0.06, 0.22)),
    }


def smooth(x: np.ndarray, sr: int, ms: float = 15.0) -> np.ndarray:
    w = np.bartlett(max(3, int(sr * ms / 1000.0)))
    w /= w.sum()
    return np.convolve(np.pad(x, (len(w) // 2,) * 2, mode="edge"), w, "same")[
        len(w) // 2 : len(w) // 2 + len(x)
    ]


def utterance(rng, sr: int, return_tracks: bool = False):
    """-> (wav, labels [(pid, tone, er)], durations_seconds); with
    ``return_tracks`` also the smoothed sample-level {f0, amp} curves
    (the QS-TTS corpus derives its pitch/energy books from them)."""
    n_spoken = int(rng.integers(10, 30))
    # tone stretches duration slightly (a real-speech-like covariate);
    # +-10% per-utterance jitter keeps the mapping learnable, not exact
    tone_dur = {0: 1.0, 1: 1.0, 2: 1.05, 3: 1.12, 4: 0.95, 5: 0.9}
    sil_dur = 0.95 * phone_params(SIL_ID)["dur"] + 0.08
    labels = [(SIL_ID, 0, 0)]
    durs = [sil_dur * float(rng.uniform(0.9, 1.1))]
    for _ in range(n_spoken):
        pid = int(rng.integers(len(UNSPOKEN), len(UNSPOKEN) + len(SPOKEN)))
        tone = int(rng.integers(1, 6))
        er = int(rng.random() < 0.1)
        labels.append((pid, tone, er))
        durs.append(
            phone_params(pid)["dur"] * tone_dur[tone] * float(rng.uniform(0.9, 1.1))
        )
    labels.append((SIL_ID, 0, 0))
    durs.append(sil_dur * float(rng.uniform(0.9, 1.1)))

    n = int(round(sum(durs) * sr))
    f0 = np.zeros(n)
    amp = np.zeros(n)
    harm = np.zeros((n, N_HARM))
    pos = 0
    for (pid, tone, er), d in zip(labels, durs):
        seg = slice(pos, min(n, pos + int(round(d * sr))))
        if pid == SIL_ID:
            f0[seg], amp[seg] = 150.0, 0.0  # unvoiced: harmonics gated by amp
        else:
            p = phone_params(pid)
            f0[seg] = p["f0"] * TONE_F0_SCALE[tone]
            amp[seg] = p["amp"]
            h = p["harm"].copy()
            if er:  # erhua: tilt the spectrum darker
                h *= 0.6 ** np.arange(N_HARM)
            harm[seg] = h
        pos = seg.stop
    f0, amp = smooth(f0, sr), smooth(amp, sr)
    for k in range(N_HARM):
        harm[:, k] = smooth(harm[:, k], sr)

    phase = 2 * np.pi * np.cumsum(f0) / sr
    wav = np.zeros(n)
    for k in range(N_HARM):
        wav += harm[:, k] * np.sin((k + 1) * phase + 2 * np.pi * k / N_HARM)
    wav = wav * amp + rng.normal(size=n) * 0.003
    wav = wav / np.max(np.abs(wav)) * 10 ** (-7.0 / 20.0)  # recipe -7 dBFS
    if return_tracks:
        return wav.astype(np.float32), labels, durs, {"f0": f0, "amp": amp}
    return wav.astype(np.float32), labels, durs


def frame_durations(durs_s, n_frames: int, sr: int, fs: int) -> list:
    """Seconds -> integer frame durations summing exactly to n_frames
    (cumulative rounding, same convention as TTSDataset's rescale)."""
    bounds = np.round(np.cumsum(durs_s) * sr / fs).astype(np.int64)
    bounds = np.clip(bounds, 0, n_frames)
    bounds[-1] = n_frames
    return np.diff(np.concatenate([[0], bounds])).tolist()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-utts", type=int, default=120)
    p.add_argument("--n-valid", type=int, default=6)
    p.add_argument("--sample-rate", type=int, default=24000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    cfg = AudioConfig(sample_rate=args.sample_rate)
    fs = cfg.hop_length
    rng = np.random.default_rng(args.seed)
    os.makedirs(f"{args.out}/wav", exist_ok=True)
    os.makedirs(f"{args.out}/mel", exist_ok=True)

    ids, phone_book, dur_book, tts_cases = [], [], [], {}
    for i in range(args.n_utts + args.n_valid):
        uid = f"syn{i:04d}"
        wav, labels, durs = utterance(rng, args.sample_rate)
        mel = melspectrogram(wav, cfg)
        frames = min(len(mel), len(wav) // fs)
        mel, wav = mel[:frames], wav[: frames * fs]
        np.save(f"{args.out}/mel/{uid}.npy", mel)
        save_wav(f"{args.out}/wav/{uid}.wav", wav, args.sample_rate)
        text = " ".join("_".join(map(str, lab)) for lab in labels)
        phone_book.append(f"{uid}|{text}")
        fdurs = frame_durations(durs, frames, args.sample_rate, fs)
        dur_book.append(f"{uid}|" + " ".join(str(d) for d in fdurs))
        tts_cases[uid] = (text, " ".join(str(d) for d in fdurs))
        ids.append(uid)

    train, valid = ids[: args.n_utts], ids[args.n_utts :]
    with open(f"{args.out}/train.list", "w") as f:
        f.write("\n".join(train) + "\n")
    with open(f"{args.out}/valid.list", "w") as f:
        f.write("\n".join(valid) + "\n")
    with open(f"{args.out}/phone.txt", "w") as f:
        f.write("\n".join(phone_book) + "\n")
    with open(f"{args.out}/dur.txt", "w") as f:
        f.write("\n".join(dur_book) + "\n")
    # analysis-synthesis testlist (reference test_ae.yaml shape)
    with open(f"{args.out}/test_ae.yaml", "w") as f:
        for uid in valid:
            f.write(f"{uid}:\n  mel: {args.out}/mel/{uid}.npy\n")
    # forced-duration TTS testlist (frame durations align with ground truth)
    with open(f"{args.out}/test_tts.yaml", "w") as f:
        for uid in valid:
            text, fdur = tts_cases[uid]
            f.write(f'{uid}:\n  text: "{text}"\n  dur: "{fdur}"\n')
    print(f"wrote {len(train)} train + {len(valid)} valid utts to {args.out}")


if __name__ == "__main__":
    main()
