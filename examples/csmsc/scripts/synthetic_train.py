#!/usr/bin/env python
"""Derive + supervise a full-size CSMSC training run on the synthetic corpus.

Regenerates, from committed sources only, the long-running training
artifacts earlier rounds kept in /tmp (see CLAUDE.md "Long-running
artifacts"): derives a training YAML from the full-size CSMSC recipe
(examples/csmsc/configs/msmc_vq_gan[_am].yaml) with the dataset pointed at a
`synthetic_corpus.py` output directory, then runs `train.py` under a
restart-on-crash loop. The supervisor exists because the dev tunnel's axon
client leaks host RSS per H2D (CLAUDE.md) — long feeds eventually OOM-kill
the process; auto-resume + graceful-preemption snapshots make restarts
lossless to within iters_per_checkpoint steps.

Recipe deviations from the published 800k-step CSMSC run, chosen so the
synthetic corpus trends in hours on one chip (PARITY.md "Measured"):
  * AE: warmup_steps 2000 (GAN phase starts early), checkpoint every 4000.
  * AM: predictor/duration-predictor dropouts forced to 0 — the corpus is
    deterministic given phones, and dropout-trained cascades shift under
    eval-mode rescaling enough to break codebook snapping (r2 finding,
    PARITY.md "dropout-shift"). Real-speech recipes keep the dropouts.

Usage:
  python examples/csmsc/scripts/synthetic_train.py --corpus /tmp/syncorpus2 \
      --out /tmp/synrun3 --steps 48000                      # stage 1 (AE)
  python examples/csmsc/scripts/synthetic_train.py --corpus /tmp/syncorpus2 \
      --out /tmp/synrun3 --stage am --steps 12000 \
      --ae-checkpoint /tmp/synrun3/ckpt_ae/model_48000      # stage 2 (AM)
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
AE_YAML = os.path.join(REPO, "examples/csmsc/configs/msmc_vq_gan.yaml")
AM_YAML = os.path.join(REPO, "examples/csmsc/configs/msmc_vq_gan_am.yaml")


def derive_config(stage, corpus, out, steps, ckpt_every, ae_checkpoint):
    sys.path.insert(0, REPO)
    from msmctts_tpu.config import load_yaml

    cfg = load_yaml(AE_YAML if stage == "ae" else AM_YAML)
    ds = cfg["dataset"]
    ds["id_list"] = os.path.join(corpus, "train.list")
    cfg["training_steps"] = steps
    cfg["iters_per_checkpoint"] = ckpt_every
    cfg["save_checkpoint_dir"] = os.path.join(out, f"ckpt_{stage}")
    if stage == "ae":
        ds["feature_path"] = [
            os.path.join(corpus, "mel/{}.npy"),
            os.path.join(corpus, "wav/{}.wav"),
        ]
        cfg["trainer"]["warmup_steps"] = 2000
    else:
        ds["feature_path"] = [
            os.path.join(corpus, "phone.txt"),
            os.path.join(corpus, "dur.txt"),
            os.path.join(corpus, "mel/{}.npy"),
        ]
        cfg["task"]["autoencoder"]["_checkpoint"] = ae_checkpoint
        # Deterministic corpus: zero every dropout in the predictor tree
        # (r2 dropout-shift finding, PARITY.md).
        def zero_dropouts(node):
            if isinstance(node, dict):
                for k, v in node.items():
                    if k.endswith("dropout"):
                        node[k] = 0.0
                    else:
                        zero_dropouts(v)
            elif isinstance(node, list):
                for v in node:
                    zero_dropouts(v)
        zero_dropouts(cfg["task"]["predictor"])

    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, f"{stage}.yaml")
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg), f)
    return path


def supervise(yaml_path, log_every, max_restarts):
    """Restart-on-crash loop; rc 0 = training_steps reached."""
    for attempt in range(max_restarts + 1):
        cmd = [sys.executable, os.path.join(REPO, "train.py"), "-c", yaml_path,
               "--log-every", str(log_every)]
        print(f"[supervisor] attempt {attempt}: {' '.join(cmd)}", flush=True)
        rc = subprocess.call(cmd)
        if rc == 0:
            print("[supervisor] training completed", flush=True)
            return 0
        print(f"[supervisor] train.py exited rc={rc}; restarting in 5 s "
              f"(auto-resume from the latest snapshot)", flush=True)
        time.sleep(5)
    print("[supervisor] restart budget exhausted", flush=True)
    return 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True, help="synthetic_corpus.py --out dir")
    p.add_argument("--out", required=True, help="run dir (configs + checkpoints)")
    p.add_argument("--stage", choices=["ae", "am"], default="ae")
    p.add_argument("--steps", type=int, default=48000)
    p.add_argument("--ckpt-every", type=int, default=4000)
    p.add_argument("--ae-checkpoint", default=None,
                   help="frozen AE checkpoint path (required for --stage am)")
    p.add_argument("--log-every", type=int, default=200)
    p.add_argument("--max-restarts", type=int, default=50)
    p.add_argument("--derive-only", action="store_true")
    args = p.parse_args()

    if args.stage == "am" and not args.ae_checkpoint:
        p.error("--stage am requires --ae-checkpoint")
    yaml_path = derive_config(args.stage, args.corpus, args.out, args.steps,
                              args.ckpt_every, args.ae_checkpoint)
    print(f"[supervisor] derived {yaml_path}", flush=True)
    if args.derive_only:
        return 0
    return supervise(yaml_path, args.log_every, args.max_restarts)


if __name__ == "__main__":
    sys.exit(main())
