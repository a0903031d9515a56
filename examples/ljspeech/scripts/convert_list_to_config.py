#!/usr/bin/env python
"""Build infer test-list YAMLs from id lists and feature books/dirs
(reference examples/ljspeech/scripts/convert_list_to_config.py).

Usage:
  python convert_list_to_config.py --ids valid.list --out test_ae.yaml \
      --path mel=data/mel/{}.npy
  python convert_list_to_config.py --ids valid.list --out test_tts.yaml \
      --book text=data/phone.txt
"""

import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ids", required=True, help="one utterance id per line")
    p.add_argument("--out", required=True)
    p.add_argument("--path", action="append", default=[],
                   help="feat=template with {} placeholder (file reference)")
    p.add_argument("--book", action="append", default=[],
                   help="feat=bookfile ('id|payload' lines; payload inlined)")
    p.add_argument("--const", action="append", default=[],
                   help="feat=value added verbatim to every case (e.g. a "
                        "shared reference wav, qs-tts gen_testlists.py's "
                        "ref= field)")
    args = p.parse_args()

    with open(args.ids) as f:
        ids = [ln.strip().split()[0] for ln in f if ln.strip()]

    books = {}
    for spec in args.book:
        feat, path = spec.split("=", 1)
        entries = {}
        with open(path) as f:
            for ln in f:
                segs = ln.strip().split("|")
                if len(segs) >= 2:
                    entries[segs[0]] = segs[1]
        books[feat] = entries

    out = {}
    for uid in ids:
        case = {}
        for spec in args.path:
            feat, template = spec.split("=", 1)
            case[feat] = template.format(uid)
        for feat, entries in books.items():
            if uid in entries:
                case[feat] = entries[uid]
        for spec in args.const:
            feat, value = spec.split("=", 1)
            case[feat] = value
        if case:
            out[uid] = case

    with open(args.out, "w") as f:
        yaml.safe_dump(out, f, sort_keys=True)
    print(f"{len(out)} cases -> {args.out}")


if __name__ == "__main__":
    main()
