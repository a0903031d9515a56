#!/usr/bin/env python
"""Convert a reference (hhguo/MSMC-TTS, PyTorch) training checkpoint into
an msmctts-tpu snapshot loadable by ``infer.py -m`` / ``train.py``
(restore/pretrain paths).

The reference saves ``{'model': task.state_dict(), 'optimizer': ...,
'iteration': N, 'config': ...}`` (msmctts/trainers/base_trainer.py:136-142)
where the task module holds per-module prefixes (``autoencoder.*``,
``predictor.*``, ``discriminator.*``). This tool transplants the
convertible modules via msmctts_tpu.utils.torch_compat (the converters are
golden-tested against the live reference modules in
tests/test_reference_parity.py) and writes a self-describing snapshot with
one of THIS build's YAML configs embedded.

Discriminators are not converted (inference never needs them, and a
resumed GAN phase re-estimates them quickly); optimizer state is not
carried over (optax and torch moments are not interchangeable).

Usage:
  python tools/convert_torch_checkpoint.py \
      --torch /path/to/reference/model_800000 \
      --config examples/csmsc/configs/msmc_vq_gan.yaml \
      --out checkpoints/msmc_vq_gan/model_800000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from msmctts_tpu.config import Config  # noqa: E402
from msmctts_tpu.utils import torch_compat as tc  # noqa: E402
from msmctts_tpu.utils.checkpoint import save_checkpoint  # noqa: E402


def convert(sd: dict) -> dict:
    """Numpy state dict (full task module) -> {'params': ..., 'codebook':?}."""
    state = {"params": {}}
    if any(k.startswith("autoencoder.") for k in sd):
        v = tc.msmc_vqgan(sd, "autoencoder")
        state["params"]["autoencoder"] = v["params"]
        state["codebook"] = v["codebook"]
        if "batch_stats" in v:  # quantizer norm:True running stats
            state["model_state"] = {"batch_stats": v["batch_stats"]}
    if any(k.startswith("predictor.") for k in sd):
        state["params"]["predictor"] = tc.multi_stage_predictor(sd, "predictor")
    skipped = sorted(
        {k.split(".", 1)[0] for k in sd}
        - {"autoencoder", "predictor"}
    )
    if skipped:
        print(f"note: skipping non-convertible modules: {', '.join(skipped)}")
    if not state["params"]:
        raise SystemExit("no convertible modules found in the checkpoint")
    return state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch", required=True, dest="torch_path",
                   help="reference checkpoint (torch.save format)")
    p.add_argument("--config", required=True,
                   help="msmctts-tpu YAML to embed (must describe the same "
                        "architecture, e.g. the matching examples/ recipe)")
    p.add_argument("--out", required=True, help="output snapshot path")
    p.add_argument("--iteration", type=int, default=None,
                   help="override the recorded iteration")
    args = p.parse_args()

    import torch

    ckpt = torch.load(args.torch_path, map_location="cpu", weights_only=False)
    model_sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    sd = tc.state_dict_to_numpy(model_sd)
    state = convert(sd)

    iteration = args.iteration
    if iteration is None:
        iteration = int(ckpt.get("iteration", 0)) if isinstance(ckpt, dict) else 0
    config = Config(args.config)
    save_checkpoint(args.out, state, iteration, config.to_dict())
    names = ", ".join(state["params"])
    print(f"wrote {args.out} (iteration {iteration}; modules: {names})")


if __name__ == "__main__":
    main()
