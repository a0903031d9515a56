#!/usr/bin/env python
"""HuBERT SSL feature extraction for QS-TTS.

Reference (examples/qs-tts/scripts/extract_ssl_hubert.py:31-86) loads a
fairseq Chinese-HuBERT checkpoint, takes layer features at 20 ms, and
nearest-interpolates them x1.6 to the 12.5 ms acoustic frame rate. fairseq
is not in this image; this version uses the ``transformers`` HubertModel
(same architecture, same 20 ms stride) with the same nearest-neighbor
resampling.

Usage:
  python extract_ssl_hubert.py --wav-dir wavs/ --out-dir emb/ \
      --model TencentGameMate/chinese-hubert-large --layer 24
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from msmctts_tpu.data.datasets import load_wav  # noqa: E402


def nearest_resample(feat: np.ndarray, ratio: float) -> np.ndarray:
    """[T, D] -> [round(T*ratio), D] by nearest-neighbor index mapping
    (the reference's 20 ms -> 12.5 ms x1.6 interpolation)."""
    T = feat.shape[0]
    n_out = int(round(T * ratio))
    idx = np.minimum((np.arange(n_out) / ratio).astype(np.int64), T - 1)
    return feat[idx]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--model", default="TencentGameMate/chinese-hubert-large")
    p.add_argument("--layer", type=int, default=-1, help="hidden layer index")
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--ratio", type=float, default=1.6,
                   help="frame-rate ratio (20ms -> 12.5ms = 1.6)")
    args = p.parse_args()

    import torch
    from transformers import HubertModel

    model = HubertModel.from_pretrained(args.model)
    model.eval()

    os.makedirs(args.out_dir, exist_ok=True)
    names = sorted(f for f in os.listdir(args.wav_dir) if f.endswith(".wav"))
    for name in names:
        uid = os.path.splitext(name)[0]
        wav = load_wav(os.path.join(args.wav_dir, name), args.sample_rate)
        with torch.no_grad():
            out = model(
                torch.from_numpy(wav)[None, :], output_hidden_states=True
            )
        feat = out.hidden_states[args.layer][0].numpy()
        feat = nearest_resample(feat, args.ratio)
        np.save(os.path.join(args.out_dir, uid + ".npy"), feat.astype(np.float32))
        print(uid, feat.shape)


if __name__ == "__main__":
    main()
