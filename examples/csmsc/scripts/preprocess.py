#!/usr/bin/env python
"""CSMSC dataset preparation (reference examples/csmsc/scripts/
process_dataset.sh + audio/melspectrogram.py + text/parse_textgrid.py).

Stages (each optional):
  * wav:  mono, resample to --sample-rate, peak-normalize to -7 dBFS
          (the sox call in audio_normalization.sh, done with scipy here)
  * mel:  normalized log-mel via the framework's recipe-parity extractor
          (msmctts_tpu/utils/audio.py), parallel over processes
  * text: TextGrid phone alignments -> phone.txt / dur.txt books
          (80 frames/s rounding with error carry, parse_textgrid.py:35-40)
  * list: train/valid filelists

Usage:
  python preprocess.py --wav-in CSMSC/Wave --textgrid-in CSMSC/PhoneLabeling \
      --out data/ --sample-rate 24000
"""

import argparse
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from msmctts_tpu.data.datasets import load_wav, save_wav  # noqa: E402
from msmctts_tpu.utils.audio import AudioConfig, melspectrogram  # noqa: E402
from msmctts_tpu.utils.text import encode_phone_string  # noqa: E402


def normalize_wav(path_in, path_out, sample_rate, norm_db=-7.0):
    from scipy.signal import resample_poly
    from scipy.io import wavfile
    import math

    sr, data = wavfile.read(path_in)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if sr != sample_rate:
        g = math.gcd(sr, sample_rate)
        data = resample_poly(data, sample_rate // g, sr // g)
    # peak normalize (sox --norm=<db>, audio_normalization.sh); None skips
    if norm_db is not None:
        peak = np.abs(data).max()
        if peak > 0:
            data = data * (10 ** (norm_db / 20.0) / peak)
    save_wav(path_out, data, sample_rate)


def extract_mel(path_wav, path_mel, cfg):
    wav = load_wav(path_wav, cfg.sample_rate)
    np.save(path_mel, melspectrogram(wav, cfg))


def parse_textgrid(path):
    """Minimal TextGrid interval parser: returns (starts, ends, labels) of
    the first interval tier (the reference assumes a fixed line layout,
    parse_textgrid.py:14-20; this parses properly)."""
    starts, ends, labels = [], [], []
    with open(path, errors="ignore") as f:
        lines = [ln.strip() for ln in f]
    i = 0
    in_intervals = False
    cur = {}
    for ln in lines:
        if ln.startswith("intervals ["):
            in_intervals = True
            cur = {}
        elif in_intervals and ln.startswith("xmin"):
            cur["xmin"] = float(ln.split("=")[1])
        elif in_intervals and ln.startswith("xmax"):
            cur["xmax"] = float(ln.split("=")[1])
        elif in_intervals and ln.startswith("text"):
            label = ln.split("=", 1)[1].strip().strip('"')
            starts.append(cur.get("xmin", 0.0))
            ends.append(cur.get("xmax", 0.0))
            labels.append(label)
    return starts, ends, labels


def durations_to_frames(starts, ends, frames_per_second=80.0):
    """Seconds -> integer frames, carrying the rounding error forward
    (parse_textgrid.py:35-40)."""
    dur = [(e - s) * frames_per_second for s, e in zip(starts, ends)]
    rest = 0.0
    out = []
    for d in dur:
        d += rest
        r = round(d)
        rest = d - r
        out.append(r)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav-in", help="raw wav dir")
    p.add_argument("--textgrid-in", help="TextGrid dir")
    p.add_argument("--out", required=True)
    p.add_argument("--sample-rate", type=int, default=24000)
    p.add_argument("--norm-db", default="-7",
                   help="peak-normalization level in dBFS "
                        "(audio_normalization.sh's sox --norm=-7); "
                        "'none' to skip")
    p.add_argument("--frame-shift-ms", type=float, default=12.5)
    p.add_argument("--valid-utts", type=int, default=20)
    p.add_argument("--workers", type=int, default=os.cpu_count())
    args = p.parse_args()
    norm_db = None if str(args.norm_db).lower() == "none" else float(args.norm_db)

    os.makedirs(args.out, exist_ok=True)
    wav_dir = os.path.join(args.out, f"wav_{args.sample_rate}")
    mel_dir = os.path.join(args.out, "mel")
    ids = []

    if args.wav_in:
        os.makedirs(wav_dir, exist_ok=True)
        os.makedirs(mel_dir, exist_ok=True)
        cfg = AudioConfig(
            sample_rate=args.sample_rate, frame_shift_ms=args.frame_shift_ms
        )
        names = sorted(f for f in os.listdir(args.wav_in) if f.endswith(".wav"))
        with ProcessPoolExecutor(max_workers=args.workers) as ex:
            futs = []
            for name in names:
                uid = os.path.splitext(name)[0]
                ids.append(uid)
                src = os.path.join(args.wav_in, name)
                dst = os.path.join(wav_dir, name)
                futs.append(ex.submit(_one, src, dst, os.path.join(mel_dir, uid), cfg, args.sample_rate, norm_db))
            for f in futs:
                f.result()
        print(f"processed {len(ids)} wavs -> {wav_dir}, {mel_dir}")

    if args.textgrid_in:
        frames_per_second = 1000.0 / args.frame_shift_ms
        phone_lines, dur_lines = [], []
        for name in sorted(os.listdir(args.textgrid_in)):
            uid = os.path.splitext(name)[0]
            starts, ends, labels = parse_textgrid(os.path.join(args.textgrid_in, name))
            if not labels:
                continue
            phones = encode_phone_string(labels)
            frames = durations_to_frames(starts, ends, frames_per_second)
            phone_lines.append(f"{uid}|{phones}")
            dur_lines.append(f"{uid}|{' '.join(map(str, frames))}")
        with open(os.path.join(args.out, "phone.txt"), "w") as f:
            f.write("\n".join(phone_lines) + "\n")
        with open(os.path.join(args.out, "dur.txt"), "w") as f:
            f.write("\n".join(dur_lines) + "\n")
        print(f"wrote {len(phone_lines)} aligned texts")

    if ids:
        os.makedirs(os.path.join(args.out, "filelists"), exist_ok=True)
        with open(os.path.join(args.out, "filelists", "train.list"), "w") as f:
            f.write("\n".join(ids[args.valid_utts :]) + "\n")
        with open(os.path.join(args.out, "filelists", "valid.list"), "w") as f:
            f.write("\n".join(ids[: args.valid_utts]) + "\n")


def _one(src, dst, mel_base, cfg, sr, norm_db=-7.0):
    normalize_wav(src, dst, sr, norm_db)
    extract_mel(dst, mel_base, cfg)


if __name__ == "__main__":
    main()
