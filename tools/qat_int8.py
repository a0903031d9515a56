#!/usr/bin/env python
"""Int8 QAT fine-tune of a trained MSMC-VQ-GAN's HiFi-GAN decoder.

Post-training int8 bottoms out at +7.8% rel AS-MCD on trained weights
(ab_int8_r4.json names this fix). This tool runs the brief STE fake-quant
fine-tune (ops/qat_int8.py): it distills the decoder's own float output —
so nothing else in the checkpoint (encoder, quantizer, codebooks, AM
contract) moves — through the exact serving quantization grid (per-channel
int8 weights, SmoothQuant fold, calibrated static per-tensor activation
scales), then writes a NEW checkpoint with the QAT'd kernels folded back
into the weight-norm parametrization. The output checkpoint serves through
every existing int8 surface unchanged (infer.py --int8,
tools/as_mcd_sweep.py --int8, serve.py --int8), and its bf16/fp32 decode
is the QAT'd decoder (expected within noise of the original — verify with
a plain as_mcd_sweep on the same file).

Usage (after a synthetic_train.py run):
  python tools/qat_int8.py --ckpt /tmp/synrun5/ckpt_ae/model_24000 \
      --id-list /tmp/syncorpus2/train.list \
      --out /tmp/synrun5/ckpt_ae/model_24000_qat --steps 2000
  python tools/as_mcd_sweep.py --ckpt-dir ... --snapshots ... --int8
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def extract_smooth(qparams) -> dict:
    """site -> SmoothQuant s_in vectors out of an Int8Decoder's qparams
    (present only where the calibration applied a fold)."""
    smooth = {}

    def visit(prefix, node):
        if "s_in" in node:
            smooth[prefix] = np.asarray(node["s_in"], np.float32)

    for site, node in qparams.items():
        if site.startswith("resblock_"):
            for sub, n in node.items():
                visit(f"{site}/{sub}", n)
        else:
            visit(site, node)
    return smooth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="trained AE checkpoint")
    ap.add_argument("--id-list", required=True,
                    help="training id list (corpus train.list)")
    ap.add_argument("--out", default=None,
                    help="output checkpoint path (default <ckpt>_qat)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--window-frames", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--l1", type=float, default=0.1,
                    help="waveform L1 weight next to the log-mel L1")
    ap.add_argument("--max-utts", type=int, default=160)
    ap.add_argument("--log-every", type=int, default=200)
    ap.add_argument("--refresh-every", type=int, default=500,
                    help="re-derive activation scales + SmoothQuant fold "
                         "from the current weights every N steps (keeps "
                         "the QAT grid matched to what a fresh serving "
                         "calibration will build)")
    ap.add_argument("--smooth-alpha", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from msmctts_tpu.utils.platform import enable_compilation_cache, honor_env_platform

    honor_env_platform(args.platform)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from msmctts_tpu.config import Config
    from msmctts_tpu.data.loader import finite_loader
    from msmctts_tpu.ops.qat_int8 import (
        calibrate_from_folded,
        fold_decoder_params,
        qat_generator_apply,
        unfold_to_weight_norm,
    )
    from msmctts_tpu.tasks import build_task
    from msmctts_tpu.training.base_trainer import build_dataset_from_config
    from msmctts_tpu.training.losses import mel_loss
    from msmctts_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    config = Config(ckpt["config"])
    sr = int(config.dataset["samplerate"])
    task = build_task(config, mode="infer")
    task.load_variables(ckpt["state"])
    ae = task.networks["autoencoder"]
    dec_cfg = {k: (list(v) if isinstance(v, (list, tuple)) else v)
               for k, v in dict(ae.decoder_config).items()}
    if dec_cfg.get("_name", "HifiGANGenerator") != "HifiGANGenerator":
        sys.exit("QAT covers the HifiGANGenerator decoder only")
    variables = task.variables["autoencoder"]
    dec_params = variables["params"]["decoder"]
    hop = int(np.prod(dec_cfg["upsample_rates"]))

    # ---- precompute decoder features + float distillation targets -----
    dataset = build_dataset_from_config(config, training=False,
                                        id_list=args.id_list)

    def _decode(mdl, x):
        return mdl.decoder(x)

    feat_fn = jax.jit(lambda v, m, l: ae.apply(
        v, m, l, method="encode_features", deterministic=True))
    dec_fn = jax.jit(lambda v, f: ae.apply(v, f, method=_decode)[..., 0])

    feats_db, wav_db = [], []
    for batch in finite_loader(dataset, 1):
        T = int(batch["mel_length"][0])
        f = feat_fn(variables, jnp.asarray(batch["mel"]),
                    jnp.asarray(batch["mel_length"]))
        w = dec_fn(variables, f)
        feats_db.append(np.asarray(f[0, :T], np.float32))
        wav_db.append(np.asarray(w[0, : T * hop], np.float32))
        if len(feats_db) >= args.max_utts:
            break
    print(f"[qat] {len(feats_db)} utterances, hop {hop}, sr {sr}", flush=True)

    # ---- serving-equivalent calibration (refreshed as weights move) ----
    alpha = None if args.smooth_alpha < 0 else args.smooth_alpha
    folded = jax.tree_util.tree_map(jnp.asarray, fold_decoder_params(dec_params, dec_cfg))
    calib_feats = jnp.asarray(feats_db[0][None])

    def calibrate(folded_):
        return calibrate_from_folded(
            jax.device_get(folded_), calib_feats, dec_cfg, smooth_alpha=alpha
        )

    scales, smooth = calibrate(folded)
    print(f"[qat] calibrated {len(scales)} sites, smooth at "
          f"{len(smooth or {})}", flush=True)

    tx = optax.adam(args.lr)
    opt_state = tx.init(folded)

    W = args.window_frames

    # scales/smooth ride as jit ARGUMENTS so a calibration refresh does not
    # recompile the step (fake_quant_act takes traced scales)
    @jax.jit
    def qat_step(folded, opt_state, feats_w, wav_w, scales, smooth):
        def loss_fn(fp):
            y = qat_generator_apply(fp, feats_w, dec_cfg,
                                    act_scales=scales, smooth=smooth)[..., 0]
            ml = mel_loss(y, wav_w, sr)
            l1 = jnp.mean(jnp.abs(y - wav_w))
            return ml + args.l1 * l1, jnp.stack([ml, l1])

        (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(folded)
        updates, opt_state = tx.update(grads, opt_state, folded)
        return optax.apply_updates(folded, updates), opt_state, m

    @jax.jit
    def eval_gap(folded, feats_w, wav_w, scales, smooth):
        y = qat_generator_apply(folded, feats_w, dec_cfg,
                                act_scales=scales, smooth=smooth)[..., 0]
        return mel_loss(y, wav_w, sr)

    rng = np.random.default_rng(args.seed)

    def sample(rng_):
        fw = np.empty((args.batch, W, feats_db[0].shape[-1]), np.float32)
        ww = np.empty((args.batch, W * hop), np.float32)
        for b in range(args.batch):
            i = int(rng_.integers(len(feats_db)))
            T = feats_db[i].shape[0]
            s = int(rng_.integers(max(T - W, 1))) if T > W else 0
            if T >= W:
                fw[b] = feats_db[i][s : s + W]
                ww[b] = wav_db[i][s * hop : (s + W) * hop]
            else:  # short utterance: tile
                reps = -(-W // T)
                fw[b] = np.tile(feats_db[i], (reps, 1))[:W]
                ww[b] = np.tile(wav_db[i], reps)[: W * hop]
        return fw, ww

    eval_rng = np.random.default_rng(12345)
    eval_batches = [sample(eval_rng) for _ in range(4)]

    def gap(scales_, smooth_):
        return float(np.mean(
            [float(eval_gap(folded, f, w, scales_, smooth_))
             for f, w in eval_batches]
        ))

    gap0 = gap(scales, smooth)
    print(f"[qat] initial fake-quant log-mel gap {gap0:.4f}", flush=True)

    t0 = time.time()
    for step in range(1, args.steps + 1):
        fw, ww = sample(rng)
        folded, opt_state, m = qat_step(folded, opt_state, fw, ww, scales, smooth)
        if step % args.refresh_every == 0 and step < args.steps:
            # the weights moved; re-derive the quantization grid exactly as
            # a fresh serving calibration on them would
            scales, smooth = calibrate(folded)
        if step % args.log_every == 0:
            m = np.asarray(m)
            rate = step / (time.time() - t0)
            print(f"[qat] step {step} mel={m[0]:.4f} l1={m[1]:.5f} "
                  f"({rate:.1f} steps/s)", flush=True)

    scales, smooth = calibrate(folded)
    gap1 = gap(scales, smooth)
    print(f"[qat] final fake-quant log-mel gap {gap1:.4f} "
          f"({(1 - gap1 / max(gap0, 1e-9)) * 100:.1f}% reduction)", flush=True)

    # ---- write back as a standard checkpoint ---------------------------
    new_dec = unfold_to_weight_norm(
        jax.device_get(folded), dict(dec_params), dec_cfg
    )
    state = ckpt["state"]
    state["params"]["autoencoder"] = dict(
        state["params"]["autoencoder"], decoder=new_dec
    )
    out = args.out or (args.ckpt + "_qat")
    save_checkpoint(out, state, ckpt["iteration"], ckpt["config"])
    print(json.dumps({
        "out": out, "steps": args.steps,
        "fake_quant_logmel_gap": {"before": round(gap0, 4),
                                  "after": round(gap1, 4)},
    }), flush=True)


if __name__ == "__main__":
    main()
