#!/usr/bin/env python
"""BPE over VQ index sequences (reference examples/qs-tts/scripts/
vq_bpe.py + indices_to_charaters.py): map codeword indices to CJK
characters, train a BPE model over the resulting "sentences", and report
the learned vocabulary.

The reference uses SentencePiece; this image does not ship it, so a
self-contained byte-pair merge trainer is included (same algorithm class,
greedy highest-frequency pair merges) with an optional sentencepiece path
when available.

Usage:
  python vq_bpe.py --indices-dir dumps/ --vocab-size 500 --out bpe.vocab
"""

import argparse
import os
from collections import Counter

CJK_BASE = 0x4E00  # indices_to_charaters.py maps idx -> chr(CJK_BASE + idx)


def indices_to_characters(indices) -> str:
    return "".join(chr(CJK_BASE + int(i)) for i in indices)


def train_bpe(corpus, vocab_size):
    """Greedy BPE over tuple-sequences; returns list of merged tokens."""
    seqs = [tuple(s) for s in corpus]
    merges = []
    while len(merges) < vocab_size:
        pairs = Counter()
        for seq in seqs:
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += 1
        if not pairs:
            break
        (a, b), count = pairs.most_common(1)[0]
        if count < 2:
            break
        merged = a + b if isinstance(a, str) else (a, b)
        merges.append(((a, b), count))
        new_seqs = []
        for seq in seqs:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b if isinstance(a, str) else (a, b))
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs.append(tuple(out))
        seqs = new_seqs
    return merges


def main():
    import numpy as np

    p = argparse.ArgumentParser()
    p.add_argument("--indices-dir", required=True,
                   help="dir of *_indices.npy dumps (from vq_analysis.py)")
    p.add_argument("--vocab-size", type=int, default=500)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    corpus = []
    for name in sorted(os.listdir(args.indices_dir)):
        if not name.endswith("_indices.npy"):
            continue
        idx = np.load(os.path.join(args.indices_dir, name))
        if idx.ndim == 2:  # multi-head: use head 0 (reference uses 1 head)
            idx = idx[:, 0]
        corpus.append(indices_to_characters(idx))

    try:
        import sentencepiece as spm  # optional fast path

        txt = args.out + ".corpus.txt"
        with open(txt, "w") as f:
            f.write("\n".join(corpus))
        spm.SentencePieceTrainer.train(
            input=txt, model_prefix=args.out, vocab_size=args.vocab_size,
            character_coverage=1.0, model_type="bpe",
        )
        print(f"sentencepiece model -> {args.out}.model")
        return
    except ImportError:
        pass

    merges = train_bpe(corpus, args.vocab_size)
    with open(args.out, "w") as f:
        for (a, b), count in merges:
            f.write(f"{a}\t{b}\t{count}\n")
    print(f"{len(merges)} BPE merges -> {args.out}")


if __name__ == "__main__":
    main()
