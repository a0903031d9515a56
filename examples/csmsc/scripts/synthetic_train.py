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

QS-TTS (aishell3-scale) stages run from a synthetic_emb_corpus.py corpus:
  ... --corpus /tmp/synembcorpus --out /tmp/embrun --stage emb --steps 9000
  ... --corpus /tmp/synembcorpus --out /tmp/embrun --stage nasyn \
      --steps 6000 --ae-checkpoint /tmp/embrun/ckpt_emb/model_9000
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
AE_YAML = os.path.join(REPO, "examples/csmsc/configs/msmc_vq_gan.yaml")
AM_YAML = os.path.join(REPO, "examples/csmsc/configs/msmc_vq_gan_am.yaml")
EMB_YAML = os.path.join(
    REPO, "examples/qs-tts/configs/synthesizer/msmc_vq_gan_hubertch_aishell3.yaml"
)
NASYN_YAML = os.path.join(
    REPO, "examples/qs-tts/configs/predictor/msmc_vq_gan_hubertch_tts.yaml"
)
STAGE_YAML = {"ae": AE_YAML, "am": AM_YAML, "emb": EMB_YAML, "nasyn": NASYN_YAML}


def derive_config(stage, corpus, out, steps, ckpt_every, ae_checkpoint,
                  base_yaml=None, precision=None):
    sys.path.insert(0, REPO)
    from msmctts_tpu.config import load_yaml

    cfg = load_yaml(base_yaml or STAGE_YAML[stage])
    ds = cfg["dataset"]
    ds["id_list"] = os.path.join(corpus, "train.list")
    cfg["training_steps"] = steps
    cfg["iters_per_checkpoint"] = ckpt_every
    cfg["save_checkpoint_dir"] = os.path.join(out, f"ckpt_{stage}")
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

    if stage == "ae":
        ds["feature_path"] = [
            os.path.join(corpus, "mel/{}.npy"),
            os.path.join(corpus, "wav/{}.wav"),
        ]
        cfg["trainer"]["warmup_steps"] = 2000
    elif stage == "am":
        ds["feature_path"] = [
            os.path.join(corpus, "phone.txt"),
            os.path.join(corpus, "dur.txt"),
            os.path.join(corpus, "mel/{}.npy"),
        ]
        cfg["task"]["autoencoder"]["_checkpoint"] = ae_checkpoint
        zero_dropouts(cfg["task"]["predictor"])
    elif stage == "emb":
        # QS-TTS synthesizer at the published aishell3 scale, on the
        # pseudo-SSL corpus (synthetic_emb_corpus.py), with the prosody
        # adversary enabled: pitch/energy conditioning into the MAMS
        # encoder + an AttrPredictor estimator trained to recover them
        # from the content representations (GRL-style; the generator
        # maximizes its error — emb_vqgan_trainer.py:96-120 spec).
        ds["feature"] = ["emb", "mel", "wav", "pitch", "energy"]
        ds["feature_path"] = [
            os.path.join(corpus, "emb/{}.npy"),
            os.path.join(corpus, "mel/{}.npy"),
            os.path.join(corpus, "wav/{}.wav"),
            os.path.join(corpus, "pitch/{}.npy"),
            os.path.join(corpus, "energy/{}.npy"),
        ]
        ds["dimension"] = [1024, 80, 1, 1, 1]
        ds["frameshift"] = [200, 200, 1, 200, 200]
        ds["padding_value"] = [0, -4, 0, 0, 0]
        ae = cfg["task"]["autoencoder"]
        ae["pitch_dim"] = 1
        ae["energy_dim"] = 1
        cfg["task"]["prosody_estimator"] = {
            "_name": "AttrPredictor",
            "in_channels": int(ae.get("n_model_size", 256)),
            "out_channels": 2,
            "kernel_size": 5,
            "n_layers": 2,
        }
        # three phases inside the short run: supervised -> +decode/STFT
        # -> +GAN (published recipe gates both at 50k of 800k steps)
        cfg["trainer"]["frame_loss_supervised_step"] = max(1, steps // 6)
        cfg["trainer"]["stft_loss_supervised_step"] = max(2, steps // 3)
    elif stage == "nasyn":
        ds["feature"] = ["text", "dur", "emb", "pitch", "energy"]
        ds["feature_path"] = [
            os.path.join(corpus, "phone.txt"),
            os.path.join(corpus, "dur.txt"),
            os.path.join(corpus, "emb/{}.npy"),
            os.path.join(corpus, "pitch/{}.npy"),
            os.path.join(corpus, "energy/{}.npy"),
        ]
        ds["dimension"] = [3, 1, 1024, 1, 1]
        ds["frameshift"] = [None, None, 200, 200, 200]
        ds["padding_value"] = [0, 0, 0, 0, 0]
        cfg["task"]["autoencoder"]["_checkpoint"] = ae_checkpoint
        # the emb-stage checkpoint embeds its own (derived) config; the
        # published _config pointer would rebuild without pitch_dim
        cfg["task"]["autoencoder"].pop("_config", None)
        zero_dropouts(cfg["task"]["predictor"])

    if precision:
        cfg["precision"] = precision
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, f"{stage}.yaml")
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg), f)
    return path


def _latest_mtime(root):
    """Newest mtime under root (logs, events, snapshots) — the liveness
    signal a training feed emits every log_every steps."""
    latest = 0.0
    for dirpath, _, names in os.walk(root):
        for n in names:
            try:
                latest = max(latest, os.path.getmtime(os.path.join(dirpath, n)))
            except OSError:
                pass
    return latest


def _run_with_watchdog(cmd, ckpt_dir, hang_timeout):
    """subprocess.call, plus a hang watchdog: the axon tunnel occasionally
    wedges a device call forever (r5 observed: 45+ min silent at full RSS,
    SIGTERM undeliverable because the handler can't preempt the native
    call). Crash-restarts are already lossless, so convert a hang into a
    crash: if nothing under ckpt_dir has been touched for hang_timeout
    seconds, SIGKILL the child. Compiles through the tunnel take minutes;
    the default timeout must stay well above the longest (GAN-phase)
    compile."""
    proc = subprocess.Popen(cmd)
    start = time.time()
    while True:
        try:
            return proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            pass
        progressed = max(_latest_mtime(ckpt_dir), start)
        if time.time() - progressed > hang_timeout:
            print(f"[supervisor] no progress under {ckpt_dir} for "
                  f"{hang_timeout:.0f}s — killing hung child pid {proc.pid}",
                  flush=True)
            proc.kill()
            proc.wait()
            return -9


def supervise(yaml_path, log_every, max_restarts, hang_timeout=900):
    """Restart-on-crash loop. rc 0 alone is NOT completion: a graceful
    preemption snapshot (SIGTERM mid-run) also exits 0 by design
    (tests/test_preemption.py), so completion is judged by the latest
    snapshot reaching training_steps."""
    import yaml

    from msmctts_tpu.utils.checkpoint import (
        checkpoint_step,
        find_latest_checkpoint,
    )

    with open(yaml_path) as f:
        cfg = yaml.safe_load(f)
    target = int(cfg["training_steps"])
    ckpt_dir = cfg["save_checkpoint_dir"]

    for attempt in range(max_restarts + 1):
        cmd = [sys.executable, os.path.join(REPO, "train.py"), "-c", yaml_path,
               "--log-every", str(log_every)]
        print(f"[supervisor] attempt {attempt}: {' '.join(cmd)}", flush=True)
        rc = _run_with_watchdog(cmd, ckpt_dir, hang_timeout)
        latest = find_latest_checkpoint(ckpt_dir)
        reached = checkpoint_step(latest) if latest else 0
        if rc == 0 and reached >= target:
            print("[supervisor] training completed", flush=True)
            return 0
        if rc == 0:
            print(f"[supervisor] clean exit at step {reached} < {target} "
                  f"(graceful preemption); resuming", flush=True)
            continue
        print(f"[supervisor] train.py exited rc={rc}; restarting in 5 s "
              f"(auto-resume from the latest snapshot)", flush=True)
        time.sleep(5)
    print("[supervisor] restart budget exhausted", flush=True)
    return 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True, help="synthetic_corpus.py --out dir")
    p.add_argument("--out", required=True, help="run dir (configs + checkpoints)")
    p.add_argument("--stage", choices=["ae", "am", "emb", "nasyn"], default="ae")
    p.add_argument("--steps", type=int, default=48000)
    p.add_argument("--ckpt-every", type=int, default=4000)
    p.add_argument("--ae-checkpoint", default=None,
                   help="frozen AE checkpoint path (required for --stage am)")
    p.add_argument("--log-every", type=int, default=200)
    p.add_argument("--max-restarts", type=int, default=50)
    p.add_argument("--hang-timeout", type=float, default=900,
                   help="SIGKILL the child if nothing under the checkpoint "
                   "dir changes for this many seconds (tunnel-hang watchdog; "
                   "must exceed the longest GAN-phase compile)")
    p.add_argument("--derive-only", action="store_true")
    p.add_argument("--precision", default=None,
                   choices=["float32", "bfloat16"],
                   help="train-step compute precision override (params stay "
                   "fp32 masters; VQ EMA/losses stay fp32 either way)")
    p.add_argument("--yaml", default=None,
                   help="base config override for the stage (e.g. "
                   "msmc_vq_gan_istft.yaml for the iSTFT-head AE recipe)")
    args = p.parse_args()

    if args.stage in ("am", "nasyn") and not args.ae_checkpoint:
        p.error(f"--stage {args.stage} requires --ae-checkpoint")
    yaml_path = derive_config(args.stage, args.corpus, args.out, args.steps,
                              args.ckpt_every, args.ae_checkpoint,
                              base_yaml=args.yaml, precision=args.precision)
    print(f"[supervisor] derived {yaml_path}", flush=True)
    if args.derive_only:
        return 0
    return supervise(yaml_path, args.log_every, args.max_restarts,
                     hang_timeout=args.hang_timeout)


if __name__ == "__main__":
    sys.exit(main())
