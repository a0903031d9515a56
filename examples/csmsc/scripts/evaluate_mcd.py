#!/usr/bin/env python
"""Objective evaluation: mel-cepstral-distortion-style distance between
generated and reference audio (the BASELINE "MCD within 1%" metric).

Computes log-mel spectra of both waveforms with the recipe extractor
(msmctts_tpu/utils/audio.py) and reports the dB-domain frame distance per
utterance plus the corpus mean. Frames are aligned by truncation (both
signals share the same text/duration when comparing analysis-synthesis or
TTS-with-given-durations outputs).

Usage:
  python evaluate_mcd.py --ref-dir wav_ref/ --gen-dir eval-800000/ \
      --suffix _wav.wav --sample-rate 24000
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from msmctts_tpu.data.datasets import load_wav  # noqa: E402
from msmctts_tpu.utils.audio import AudioConfig, mcd, melspectrogram  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ref-dir", required=True)
    p.add_argument("--gen-dir", required=True)
    p.add_argument("--suffix", default=".wav",
                   help="generated filename suffix appended to the utt id")
    p.add_argument("--sample-rate", type=int, default=24000)
    args = p.parse_args()

    cfg = AudioConfig(sample_rate=args.sample_rate)
    scores = []
    for name in sorted(os.listdir(args.ref_dir)):
        if not name.endswith(".wav"):
            continue
        uid = os.path.splitext(name)[0]
        gen_path = os.path.join(args.gen_dir, uid + args.suffix)
        if not os.path.isfile(gen_path):
            continue
        ref = melspectrogram(load_wav(os.path.join(args.ref_dir, name)), cfg)
        gen = melspectrogram(load_wav(gen_path), cfg)
        score = mcd(ref, gen)
        scores.append(score)
        print(f"{uid}: {score:.3f} dB")
    if scores:
        print(f"mean over {len(scores)} utts: {float(np.mean(scores)):.3f} dB")
    else:
        print("no matched utterances found")


if __name__ == "__main__":
    main()
