"""Trained-weights A/B vs the PyTorch reference (BASELINE.md: "MCD within
1% of the PyTorch reference").

Loads ONE checkpoint trained in THIS framework into BOTH stacks — the flax
task, and the live reference ``MSMCVQGAN`` (/root/reference/msmctts/
networks/vqgantts/msmc_vqgan.py:276-398) via the inverse converters
(``utils.torch_compat.msmc_vqgan_inv``) — runs analysis-synthesis over the
same testlist mels, and reports:

  * per-stack analysis-synthesis MCD vs ground-truth audio,
  * the relative MCD gap |jax - torch| / torch (the 1% criterion),
  * the direct stack-vs-stack output log-mel MCD (sharpest number: same
    weights, same inputs, two frameworks).

Usage:
  python tools/ab_mcd_vs_torch.py -m /tmp/synrun2/ckpt/model_66000 \
      -t /tmp/syncorpus2/test_ae.yaml -w '/tmp/syncorpus2/wav/{}.wav' \
      [--limit N] [-o out.json]

The torch forward runs unbatched per utterance (the reference infer
contract, /root/reference/infer.py:45-91); the flax side uses the task's
bucketed batch path. MCDs are computed over each stack's own valid frames.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-t", "--testlist", required=True)
    ap.add_argument("-w", "--wav-pattern", default=None,
                    help="ground-truth wav path pattern with {} for the id")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. 'cpu'); JAX_PLATFORMS "
                    "is read too early when the interpreter pre-imports jax")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import torch

    from msmctts_tpu.config import Config
    from msmctts_tpu.registry import get_dataset
    from msmctts_tpu.tasks import build_task
    from msmctts_tpu.utils import torch_compat as tc
    from msmctts_tpu.utils.audio import AudioConfig, mcd, melspectrogram
    from msmctts_tpu.utils.checkpoint import load_checkpoint
    from reference_modules import load_reference

    snap = load_checkpoint(args.model)
    config = Config(snap["config"])
    state = snap["state"]

    # ------------------------------------------------------------ dataset
    ds_cfg = dict(config.dataset)
    ds_cfg["id_list"] = args.testlist
    name = ds_cfg.pop("_name")
    dataset = get_dataset(name)(
        training=False,
        **{k: v for k, v in ds_cfg.items() if not k.startswith("_")},
    )
    n = len(dataset.id_list) if args.limit is None else min(args.limit, len(dataset.id_list))
    cases = [dataset.parse_case(i) for i in range(n)]
    ids = [dataset.id_list[i][0] for i in range(n)]
    batch = dataset.collate_fn(cases)

    samplerate = int(ds_cfg.get("samplerate", 24000))
    acfg = AudioConfig(sample_rate=samplerate)

    # ---------------------------------------------------------- flax stack
    task = build_task(config, mode="infer")
    task.load_variables(state)
    out = task.infer_step({k: v for k, v in batch.items() if k != "_id"})
    jax_wavs = [np.asarray(w) for w in out["wav"]]

    # --------------------------------------------------------- torch stack
    REFNS = load_reference()
    ae_cfg = {k: v for k, v in dict(config.task["autoencoder"]).items()
              if not k.startswith("_")}
    ref = REFNS.MSMCVQGAN(**ae_cfg)
    inv = tc.msmc_vqgan_inv(
        {
            "params": state["params"]["autoencoder"],
            "codebook": state["codebook"],
            **(
                {"batch_stats": state["model_state"]["batch_stats"]}
                if state.get("model_state", {}).get("batch_stats")
                else {}
            ),
        }
    )
    res = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in inv.items()},
        strict=False,
    )
    assert not res.unexpected_keys, res.unexpected_keys
    # frozen sinusoid tables (transformer.py:104-106 'position.weight' /
    # 'position_enc') and the reference's never-called stage-0 prior
    # predictor are not trainable state — everything else must transplant
    bad = [k for k in res.missing_keys
           if "position" not in k and ".predictor.0." not in k]
    assert not bad, f"unconverted reference params: {bad}"
    ref.eval()

    torch_wavs = []
    for i, uid in enumerate(ids):
        mel = np.asarray(cases[i]["mel"], np.float32)[None]  # [1, T, 80]
        length = torch.tensor([mel.shape[1]], dtype=torch.long)
        with torch.no_grad():
            tout = ref(torch.from_numpy(mel), length, warmup=False, window=None)
        torch_wavs.append(tout["decoder_outputs"][0, :, 0].numpy())
        print(f"torch {uid}: {torch_wavs[-1].shape[0]} samples", flush=True)

    # ------------------------------------------------------------- metrics
    rows = []
    for i, uid in enumerate(ids):
        jw, tw = jax_wavs[i], torch_wavs[i]
        m = min(len(jw), len(tw))
        jm = melspectrogram(jw[:m], acfg)
        tm = melspectrogram(tw[:m], acfg)
        row = {
            "id": uid,
            "cross_mcd": mcd(jm, tm),
            "max_abs_wav_diff": float(np.max(np.abs(jw[:m] - tw[:m]))),
        }
        if args.wav_pattern:
            from msmctts_tpu.data.datasets import load_wav

            gt = melspectrogram(load_wav(args.wav_pattern.format(uid)), acfg)
            row["jax_mcd"] = mcd(gt, jm)
            row["torch_mcd"] = mcd(gt, tm)
        rows.append(row)
        print(json.dumps(row), flush=True)

    summary = {
        "checkpoint": args.model,
        "n_utts": len(rows),
        "mean_cross_mcd": float(np.mean([r["cross_mcd"] for r in rows])),
        "max_abs_wav_diff": float(np.max([r["max_abs_wav_diff"] for r in rows])),
    }
    if args.wav_pattern:
        ja = float(np.mean([r["jax_mcd"] for r in rows]))
        to = float(np.mean([r["torch_mcd"] for r in rows]))
        summary.update(
            jax_mcd=ja,
            torch_mcd=to,
            rel_gap=abs(ja - to) / max(to, 1e-9),
        )
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "per_utt": rows}, f, indent=2)


if __name__ == "__main__":
    main()
