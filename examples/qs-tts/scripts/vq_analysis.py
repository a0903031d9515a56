#!/usr/bin/env python
"""VQ representation diagnostics: per-stage/per-head codebook usage counts
and entropy ("codebook complexity"), plus optional index/embedding dumps.

Reference: examples/qs-tts/scripts/vq_analysis.py:15-28 (which imports the
out-of-tree ``voicemaker`` package; reconstructed here against this
framework's task/checkpoint API).

Usage:
  python vq_analysis.py -m <checkpoint> -t <testlist.yaml> [-o outdir]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from msmctts_tpu.config import Config  # noqa: E402
from msmctts_tpu.data.loader import finite_loader  # noqa: E402
from msmctts_tpu.tasks import build_task  # noqa: E402
from msmctts_tpu.training.base_trainer import build_dataset_from_config  # noqa: E402
from msmctts_tpu.utils.checkpoint import load_checkpoint  # noqa: E402


def codebook_complexity(indices: np.ndarray, n_embed: int):
    """indices [N] -> (num codewords used, usage entropy in bits)."""
    counts = np.bincount(indices.reshape(-1), minlength=n_embed).astype(np.float64)
    used = int((counts > 0).sum())
    probs = counts[counts > 0] / counts.sum()
    entropy = float(-(probs * np.log2(probs)).sum())
    return used, entropy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-c", "--config", default=None)
    p.add_argument("-t", "--test_list", required=True)
    p.add_argument("-o", "--output", default=None)
    p.add_argument("-b", "--batch_size", type=int, default=1)
    args = p.parse_args()

    ckpt = load_checkpoint(args.model)
    config = Config(args.config) if args.config else Config(ckpt["config"])
    task = build_task(config, mode="infer")
    task.load_variables(ckpt["state"])
    ae = task.networks["autoencoder"]
    variables = task.variables["autoencoder"]

    dataset = build_dataset_from_config(config, training=False, id_list=args.test_list)

    feat_key = "emb" if "emb" in dataset.feature else "mel"
    jitted = {}

    def analyze(feat, length):
        T = feat.shape[1]
        if T not in jitted:
            jitted[T] = jax.jit(
                lambda v, f, l: ae.apply(v, f, l, method="analysis", deterministic=True)
            )
        return jitted[T](variables, jnp.asarray(feat), jnp.asarray(length))

    per_stage_indices = None
    dumps = {}
    for batch in finite_loader(dataset, args.batch_size):
        ids = batch.pop("_id", None)
        q = analyze(batch[feat_key], batch[feat_key + "_length"])
        idx = [np.asarray(x) for x in q["quantizer_indices"]]
        lens = [np.asarray(x) for x in q["quantizer_lengths"]]
        if per_stage_indices is None:
            per_stage_indices = [[] for _ in idx]
        for s, (ind, ln) in enumerate(zip(idx, lens)):
            for b in range(ind.shape[0]):
                per_stage_indices[s].append(ind[b, : ln[b]])
        if args.output and ids is not None:
            for b, i in enumerate(np.asarray(ids)):
                uid = dataset.id_list[int(i)][0]
                dumps[uid] = [ind[b, : ln[b]] for ind, ln in zip(idx, lens)]

    for s, chunks in enumerate(per_stage_indices):
        allidx = np.concatenate(chunks, axis=0)  # [N, H] or [N]
        if allidx.ndim == 1:
            allidx = allidx[:, None]
        n_embed = int(
            np.asarray(
                variables["codebook"]["quantizer"][f"vq_{s}"]["embed"]
            ).shape[-1]
        )
        for h in range(allidx.shape[-1]):
            used, entropy = codebook_complexity(allidx[:, h], n_embed)
            print(
                f"stage {s} head {h}: {used}/{n_embed} codewords used, "
                f"entropy {entropy:.3f} bits (complexity {2**entropy:.1f})"
            )

    if args.output:
        os.makedirs(args.output, exist_ok=True)
        for uid, stages in dumps.items():
            for s, ind in enumerate(stages):
                np.save(os.path.join(args.output, f"{uid}_stage{s}_indices.npy"), ind)
        print(f"dumped indices for {len(dumps)} utterances -> {args.output}")


if __name__ == "__main__":
    main()
