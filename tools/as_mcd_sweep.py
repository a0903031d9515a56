#!/usr/bin/env python
"""Analysis-synthesis MCD trend over a checkpoint directory's snapshots.

One process, one task: the jitted graphs compile once and every snapshot's
variables are hot-swapped in (they enter the graphs as arguments —
msmctts_tpu/tasks.py load_variables), so a full sweep costs one compile +
N cheap evals. Produces the PARITY.md "AS-MCD trend" rows reproducibly.

Usage:
  python tools/as_mcd_sweep.py --ckpt-dir /tmp/synrun3/ckpt_ae \
      -t /tmp/syncorpus2/test_ae.yaml --ref-wav '/tmp/syncorpus2/wav/{}.wav' \
      [-o sweep.json] [--snapshots 4000 8000 ...] [--platform cpu] [--int8]
"""

import argparse
import glob
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("-t", "--testlist", required=True)
    ap.add_argument("--ref-wav", required=True,
                    help="ground-truth wav path pattern with {} for the id")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--snapshots", type=int, nargs="*", default=None,
                    help="iterations to evaluate (default: all model_* found)")
    ap.add_argument("-b", "--batch-size", type=int, default=2)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--smooth-alpha", type=float, default=1.0,
                    help="SmoothQuant strength for --int8 (<0 disables)")
    ap.add_argument("--float-sites", nargs="*", default=[],
                    help="site-name prefixes kept bf16 under --int8 "
                         "(e.g. up_0 resblock_0_)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from msmctts_tpu.utils.platform import (
        enable_compilation_cache,
        honor_env_platform,
    )

    honor_env_platform(args.platform)
    enable_compilation_cache()

    from msmctts_tpu.config import Config
    from msmctts_tpu.data.datasets import load_wav
    from msmctts_tpu.data.loader import finite_loader
    from msmctts_tpu.tasks import build_task
    from msmctts_tpu.training.base_trainer import build_dataset_from_config
    from msmctts_tpu.utils.audio import AudioConfig, mcd, melspectrogram
    from msmctts_tpu.utils.checkpoint import load_checkpoint

    snaps = {}
    for path in glob.glob(os.path.join(args.ckpt_dir, "model_*")):
        m = re.fullmatch(r"model_(\d+)", os.path.basename(path))
        if m:
            snaps[int(m.group(1))] = path
    iters = sorted(args.snapshots or snaps)
    missing = [i for i in iters if i not in snaps]
    if missing:
        sys.exit(f"snapshots not found in {args.ckpt_dir}: {missing}")
    if not iters:
        sys.exit(f"no model_* snapshots in {args.ckpt_dir}")

    first = load_checkpoint(snaps[iters[0]])
    config = Config(first["config"])
    sr = int(config.dataset["samplerate"])
    acfg = AudioConfig(sample_rate=sr)
    task = build_task(config, mode="infer")
    if args.int8:
        task.int8_decoder = True
        task.int8_smooth_alpha = (
            None if args.smooth_alpha < 0 else args.smooth_alpha
        )
        task.int8_float_sites = tuple(args.float_sites)

    test_config = Config(config.to_dict())
    test_config["dataset"] = config.get("testset", config.dataset)
    dataset = build_dataset_from_config(
        test_config, training=False, id_list=args.testlist
    )
    ref_mels = {
        case[0]: melspectrogram(load_wav(args.ref_wav.format(case[0])), acfg)
        for case in dataset.id_list
    }

    results = {}
    for it in iters:
        state = first["state"] if it == iters[0] else load_checkpoint(snaps[it])["state"]
        task.load_variables(state)
        scores = []
        for batch in finite_loader(dataset, args.batch_size):
            ids = batch.pop("_id")
            out = task.infer_step(batch)
            for j, wav in enumerate(out["wav"]):
                uid = dataset.id_list[int(ids[j])][0]
                gen = melspectrogram(np.asarray(wav, np.float32), acfg)
                scores.append(mcd(ref_mels[uid], gen))
        results[it] = round(float(np.mean(scores)), 3)
        print(f"model_{it}: {results[it]:.3f} dB over {len(scores)} utts",
              flush=True)

    line = json.dumps({"metric": "as_mcd_db", "sample_rate": sr,
                       "int8": args.int8,
                       "smooth_alpha": task.int8_smooth_alpha if args.int8 else None,
                       "float_sites": list(args.float_sites) or None,
                       "snapshots": results})
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
