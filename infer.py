#!/usr/bin/env python
"""Batch offline inference CLI.

Usage parity with the reference ``infer.py`` (reference infer.py:94-134):

    python infer.py -m <checkpoint> [-c config.yaml] -t testlist.yaml -o outdir

Loads the task from the checkpoint's embedded config (or ``-c``), builds
the test dataset with ``training=False`` and ``id_list`` overridden by
``-t``, runs ``task.infer_step`` per batch, denormalizes any feature with a
``feature_stat`` (infer.py:84-87), and saves every feature named in the
config's ``save_features`` as .wav/.npy/.txt (+.png mel heatmaps when
matplotlib is available). Output dir defaults to ``eval-<iter>`` next to
the checkpoint (infer.py:23-27).
"""

import argparse
import os

import numpy as np

from msmctts_tpu.config import Config
from msmctts_tpu.data.datasets import feature_normalize, save_wav
from msmctts_tpu.data.loader import finite_loader
from msmctts_tpu.tasks import build_task
from msmctts_tpu.training.base_trainer import build_dataset_from_config
from msmctts_tpu.utils.checkpoint import load_checkpoint


def save_feature(path_base, ext, feat, samplerate=None):
    feat = np.asarray(feat)
    if ext == ".wav":
        save_wav(path_base + ext, feat, samplerate or 24000)
    elif ext == ".npy":
        np.save(path_base + ext, feat)
    elif ext == ".txt":
        np.savetxt(path_base + ext, feat)
    elif ext == ".png":
        from msmctts_tpu.utils.plot import plot_matrix

        plot_matrix(feat.T, path_base + ext)
    elif ext == ".dat":
        feat.astype(np.float32).tofile(path_base + ext)
    else:
        raise ValueError(f"unknown save extension {ext}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", required=True)
    parser.add_argument("-c", "--config", default=None)
    parser.add_argument("-t", "--test_list", required=True)
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("-b", "--batch_size", type=int, default=1)
    parser.add_argument("--debug", action="store_true",
                        help="route batches through task.debug_step")
    parser.add_argument("--int8", action="store_true",
                        help="serve the HiFi-GAN decoder in int8 (PTQ "
                             "kernels + first-batch-calibrated activation "
                             "scales; ~1.2x the bf16 decoder on v5e)")
    parser.add_argument("--static-frames", type=int, default=None,
                        help="TTS latency mode: fixed frame bucket, one "
                             "device round-trip per batch (pays padded "
                             "synthesis compute; pick ~the corpus max)")
    parser.add_argument("--mesh-devices", type=int, default=1, metavar="N",
                        help="shard every inference batch over the first N "
                             "devices (-1 = all); ragged final batches are "
                             "padded by repeating the last row and trimmed")
    args = parser.parse_args()
    from msmctts_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    from msmctts_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()


    ckpt = load_checkpoint(args.model)
    config = Config(args.config) if args.config else Config(ckpt["config"])

    out_dir = args.output
    if out_dir is None:
        out_dir = os.path.join(
            os.path.dirname(os.path.abspath(args.model)), f"eval-{ckpt['iteration']}"
        )
    os.makedirs(out_dir, exist_ok=True)

    task = build_task(config, mode="infer")
    task.load_variables(ckpt["state"])
    if args.static_frames is not None:
        task.static_max_frames = args.static_frames
    if args.int8:
        task.int8_decoder = True
    mesh = None
    if args.mesh_devices != 1:
        from msmctts_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(None if args.mesh_devices in (0, -1) else args.mesh_devices)
        task.use_mesh(mesh)

    ds_node = config.get("testset", config.dataset)
    test_config = Config(config.to_dict())
    test_config["dataset"] = ds_node
    dataset = build_dataset_from_config(
        test_config, training=False, id_list=args.test_list
    )

    save_features = config.get("save_features") or [["wav", ".wav", config.dataset["samplerate"]]]

    step_fn = task.debug_step if args.debug else task.infer_step
    total = 0
    for batch in finite_loader(dataset, args.batch_size):
        ids = batch.pop("_id", None)
        n = len(next(iter(batch.values())))
        if mesh is not None and n % mesh.size:
            pad = mesh.size - n % mesh.size
            batch = {
                k: np.concatenate([v] + [v[-1:]] * pad) for k, v in batch.items()
            }
        output = step_fn(batch)
        total += n
        for j in range(n):
            case = dataset.id_list[int(ids[j])] if ids is not None else (str(j),)
            case_name = case[0] if isinstance(case, (tuple, list)) else str(case)
            for entry in save_features:
                name, ext, sr = entry[0], entry[1], (entry[2] if len(entry) > 2 else None)
                if name not in output:
                    continue
                feat = np.asarray(output[name][j])
                if name in dataset.feature_stat:
                    feat = feature_normalize(
                        feat, dataset.feature_stat[name], denormalize=True
                    )
                save_feature(os.path.join(out_dir, case_name + "_" + name), ext, feat, sr)
    print(f"processed {total} utterances -> {out_dir}")


if __name__ == "__main__":
    main()
