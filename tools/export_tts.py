#!/usr/bin/env python
"""Export a trained TTS checkpoint as self-contained StableHLO modules.

One serialized module per (batch, text-bucket) static shape, weights
embedded, lowered for cpu+tpu — deployable with zero model code
(``msmctts_tpu.export.ExportedTTS``). See msmctts_tpu/export.py.

Usage:
  python tools/export_tts.py -m <am_ckpt> -o /path/artifacts \
      [--batch-size 8] [--text-buckets 32 64 128] [--frames 512] \
      [--selftest "3_1_0 5_2_0 ..."]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True, help="AM checkpoint")
    ap.add_argument("-c", "--config", default=None)
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--text-buckets", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    ap.add_argument("--int8", action="store_true",
                    help="freeze the int8 PTQ HiFi-GAN decoder into the "
                         "artifact (1.65x e2e on v5e)")
    ap.add_argument("--calibration-text", default=None, metavar="PHONES",
                    help="phone string used to calibrate the int8 "
                         "activation scales (default: the --selftest text; "
                         "one of the two is required with --int8)")
    ap.add_argument("--selftest", default=None, metavar="PHONES",
                    help="after export, synthesize this phone string via the "
                         "artifact AND the task path and assert they match")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from msmctts_tpu.utils.platform import honor_env_platform

    honor_env_platform(args.platform)

    from msmctts_tpu.config import Config
    from msmctts_tpu.export import ExportedTTS, save_artifacts
    from msmctts_tpu.tasks import build_task
    from msmctts_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.model)
    config = Config(args.config) if args.config else Config(ckpt["config"])
    task = build_task(config, mode="infer")
    task.load_variables(ckpt["state"])
    task.pre_infer()

    if args.int8:
        from msmctts_tpu.serving import parse_phone_string

        cal = args.calibration_text or args.selftest
        if not cal:
            sys.exit("--int8 needs --calibration-text (or --selftest)")
        tok = parse_phone_string(cal)
        text = np.zeros((args.batch_size, max(args.text_buckets),
                         tok.shape[1]), np.int32)
        text[:, : tok.shape[0]] = tok
        tl = np.full((args.batch_size,), tok.shape[0], np.int32)
        task.int8_decoder = True
        task.static_max_frames = args.frames
        task.predict({"text": text, "text_length": tl})  # calibrates scales
        task.static_max_frames = None

    manifest = save_artifacts(
        task, args.out, args.batch_size, args.text_buckets, args.frames,
        sample_rate=int(config.dataset["samplerate"]),
        platforms=args.platforms,
        int8=args.int8,
    )
    sizes = {
        n: os.path.getsize(os.path.join(args.out, n))
        for n in manifest["modules"].values()
    }
    print(f"exported {len(sizes)} modules to {args.out} "
          f"({sum(sizes.values()) / 1e6:.1f} MB total)")

    if args.selftest:
        from msmctts_tpu.serving import parse_phone_string

        tok = parse_phone_string(args.selftest)
        B, lt = args.batch_size, min(args.text_buckets)
        while lt < tok.shape[0]:
            lt = min(b for b in args.text_buckets if b >= tok.shape[0])
        text = np.zeros((B, lt, tok.shape[1]), np.int32)
        text[:] = 0
        text[0, : tok.shape[0]] = tok
        text_length = np.full((B,), 1, np.int32)
        text_length[0] = tok.shape[0]
        text[1:, 0] = tok[0]

        art = ExportedTTS(args.out)
        wav_art = art.synthesize(text, text_length)[0]

        task.static_max_frames = args.frames
        out = task.predict({"text": text, "text_length": text_length})
        wav_task = np.asarray(out["wav"][0])
        np.testing.assert_allclose(wav_art, wav_task, atol=1e-5)
        print(f"selftest ok: artifact == task path "
              f"({wav_art.shape[0]} samples)")


if __name__ == "__main__":
    sys.exit(main())
