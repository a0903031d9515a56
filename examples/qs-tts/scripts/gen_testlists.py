#!/usr/bin/env python
"""Build QS-TTS infer test-list YAMLs from id lists + feature dirs/books
(reference examples/qs-tts/scripts/gen_testlists.py, minus the fire
dependency). Thin front-end over the generic tool in
examples/ljspeech/scripts/convert_list_to_config.py.

Usage:
  python gen_testlists.py --list valid.list --out test_syn.yaml \
      --emb-dir data/emb --mel-dir data/mel \
      --pitch-dir data/pitch --energy-dir data/energy \
      [--phone-file data/phone.txt --dur-file data/dur.txt --ref-wav spk.wav]
"""

import argparse
import os
import runpy
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--list", required=True, dest="list_file")
    p.add_argument("--out", required=True)
    p.add_argument("--phone-file")
    p.add_argument("--dur-file")
    p.add_argument("--emb-dir")
    p.add_argument("--pitch-dir")
    p.add_argument("--energy-dir")
    p.add_argument("--mel-dir")
    p.add_argument("--ref-wav", help="shared reference wav (voice conversion)")
    args = p.parse_args()

    argv = ["convert_list_to_config", "--ids", args.list_file, "--out", args.out]
    if args.phone_file:
        argv += ["--book", f"text={args.phone_file}"]
    if args.dur_file:
        argv += ["--book", f"dur={args.dur_file}"]
    for feat in ("emb", "pitch", "energy", "mel"):
        d = getattr(args, f"{feat}_dir")
        if d:
            argv += ["--path", f"{feat}={os.path.join(d, '{}.npy')}"]
    if args.ref_wav:
        argv += ["--const", f"ref={args.ref_wav}"]

    tool = os.path.join(
        os.path.dirname(__file__), "..", "..", "ljspeech", "scripts",
        "convert_list_to_config.py",
    )
    sys.argv = argv
    runpy.run_path(tool, run_name="__main__")


if __name__ == "__main__":
    main()
