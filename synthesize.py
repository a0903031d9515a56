#!/usr/bin/env python
"""One-shot synthesis CLI: phone string in, waveform out.

A convenience wrapper over the task inference path (the reference's only
synthesis flow is infer.py with test-list YAMLs):

    python synthesize.py -m <am_checkpoint> \
        --text "1_0_0 33_4_0 17_4_0 1_0_0" -o out.wav

Phone tokens are ``id_tone_er`` triples (msmctts_tpu/utils/text.py;
generate from labeled pinyin with ``encode_phone_string``).
"""

import argparse

import numpy as np

from msmctts_tpu.config import Config
from msmctts_tpu.data.datasets import save_wav
from msmctts_tpu.tasks import build_task
from msmctts_tpu.utils.checkpoint import load_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-c", "--config", default=None)
    p.add_argument("--text", required=True, help="id_tone_er phone tokens")
    p.add_argument("-o", "--output", default="out.wav")
    p.add_argument("--static-frames", type=int, default=None,
                   help="fixed frame bucket, single device round-trip "
                        "(infer.py's latency mode)")
    args = p.parse_args()
    from msmctts_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    from msmctts_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()


    ckpt = load_checkpoint(args.model)
    config = Config(args.config) if args.config else Config(ckpt["config"])
    task = build_task(config, mode="infer")
    task.load_variables(ckpt["state"])
    if args.static_frames is not None:
        task.static_max_frames = args.static_frames

    tokens = [
        [int(x) for x in tok.split("_")] for tok in args.text.split() if tok
    ]
    text = np.asarray(tokens, np.int32)[None]  # [1, L, n_streams]
    batch = {
        "text": text,
        "text_length": np.asarray([text.shape[1]], np.int32),
    }
    out = task.infer_step(batch)
    wav = np.asarray(out["wav"][0])
    sr = config.dataset["samplerate"]
    save_wav(args.output, wav, sr)
    print(f"{wav.shape[0] / sr:.2f}s of audio -> {args.output}")


if __name__ == "__main__":
    main()
