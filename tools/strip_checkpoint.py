#!/usr/bin/env python
"""Strip a training checkpoint to its inference essentials.

Training snapshots carry optimizer state (2 Adam moments per param) and
the discriminator — ~4x the bytes an inference consumer needs. This keeps
``params`` (minus modules named in --drop), ``codebook``, and
``model_state``, preserving the embedded config (the reference's
self-describing-checkpoint property, base_trainer.py:138-142), so the
output still drives infer.py / serve.py / as_mcd_sweep.py directly.

Used to produce the committed repo fixture (tests/fixtures/) — a small
genuinely-trained AE that survives /tmp wipes and host swaps, so the
quality-tool chain (AS-MCD, int8 A/B) smokes without a 2 h regeneration.

  python tools/strip_checkpoint.py /tmp/synrun5/ckpt_ae/model_8000 \
      -o tests/fixtures/csmsc_half_ae.ckpt --drop discriminator
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--drop", nargs="*", default=["discriminator"],
                    help="top-level param modules to drop (train-only)")
    ap.add_argument("--f16", action="store_true",
                    help="store float leaves as float16 (halves bytes; "
                    "~1e-3 rel rounding — fine for smoke fixtures, not "
                    "for resuming training)")
    args = ap.parse_args()

    from msmctts_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    state = ckpt["state"]
    params = {k: v for k, v in state["params"].items() if k not in args.drop}
    slim = {"params": params}
    if "codebook" in state:
        slim["codebook"] = state["codebook"]
    if state.get("model_state"):
        slim["model_state"] = state["model_state"]

    if args.f16:
        import jax

        slim = jax.tree_util.tree_map(
            lambda x: x.astype(np.float16)
            if isinstance(x, np.ndarray) and x.dtype == np.float32 else x,
            slim,
        )

    save_checkpoint(args.out, slim, ckpt["iteration"], ckpt["config"])
    print(f"{args.out}: {os.path.getsize(args.out) / 1e6:.1f} MB "
          f"(from {os.path.getsize(args.ckpt) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
