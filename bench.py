#!/usr/bin/env python
"""Benchmark: end-to-end TTS synthesis throughput on the flagship
CSMSC-shaped models (MultiStagePredictor 600-wide + MSMC-VQ-GAN with
HiFi-GAN x300 upsampling, 24 kHz).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 300 — the driver-set north star of >=300x
real-time per chip (BASELINE.md). Weights are randomly initialized (the
compute graph, not the audio, is what is being measured).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from msmctts_tpu.config import component_kwargs, load_yaml
from msmctts_tpu.models.msmc_vqgan import MSMCVQGAN
from msmctts_tpu.models.predictor import MultiStagePredictor
from msmctts_tpu.parallel.precision import cast_floats

SAMPLE_RATE = 24000
FRAMESHIFT = 300  # samples per frame (12.5 ms)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fp32", action="store_true",
                        help="benchmark in float32 instead of bfloat16")
    args = parser.parse_args()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    ae_node = load_yaml("examples/csmsc/configs/msmc_vq_gan.yaml")["task"]["autoencoder"]
    am_node = load_yaml("examples/csmsc/configs/msmc_vq_gan_am.yaml")["task"]["predictor"]
    ae = MSMCVQGAN(**component_kwargs(ae_node))
    predictor = MultiStagePredictor(**component_kwargs(am_node))

    B, Lt, T = 16, 128, 512  # 16 utterances x 6.4 s each
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 90, size=(B, Lt, 3)).astype(np.int32))
    text_length = jnp.full((B,), Lt, jnp.int32)
    dur = jnp.full((B, Lt), T // Lt, jnp.float32)

    k = jax.random.PRNGKey(0)
    # jitted init: one compiled program instead of per-parameter dispatches
    pvars = jax.jit(
        lambda k: predictor.init(
            {"params": k, "dropout": k}, text, text_length, dur=dur,
            max_frames=T, deterministic=True,
        )
    )(k)
    mel = jnp.zeros((2, 16, 80), jnp.float32)
    avars = jax.jit(
        lambda k: ae.init(
            {"params": k, "dropout": k}, mel, jnp.asarray([16, 16]),
            warmup=False, deterministic=True,
        )
    )(k)
    codebooks = [
        avars["codebook"]["quantizer"][f"vq_{i}"]["embed"] for i in range(2)
    ]
    # production inference precision: bf16 activations/params, fp32 VQ
    pvars = dict(pvars, params=cast_floats(pvars["params"], dtype))
    avars = dict(avars, params=cast_floats(avars["params"], dtype))

    @jax.jit
    def tts(pv, av, text, text_length, dur, cbs):
        out = predictor.apply(
            pv, text, text_length, dur=dur, max_frames=T, codebooks=cbs,
            deterministic=True,
        )
        wav = ae.apply(
            av, out["feat"], out["feat_length"], method="synthesis",
            deterministic=True,
        )
        return wav

    # warmup / compile
    wav = tts(pvars, avars, text, text_length, dur, codebooks)
    wav.block_until_ready()
    assert wav.shape == (B, T * FRAMESHIFT, 1), wav.shape

    # distinct inputs per run so no layer of the stack can cache results
    n_runs = 8
    texts = [
        jnp.asarray(rng.integers(1, 90, size=(B, Lt, 3)).astype(np.int32))
        for _ in range(n_runs)
    ]
    jax.block_until_ready(texts)
    t0 = time.perf_counter()
    for i in range(n_runs):
        wav = tts(pvars, avars, texts[i], text_length, dur, codebooks)
    wav.block_until_ready()
    wall = (time.perf_counter() - t0) / n_runs
    audio_seconds = B * T * FRAMESHIFT / SAMPLE_RATE
    rtf = audio_seconds / wall
    print(
        json.dumps(
            {
                "metric": "e2e_tts_throughput",
                "value": round(rtf, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf / 300.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
