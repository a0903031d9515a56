"""Checkpointing: self-describing train-state snapshots.

Keeps the reference's key property — the full config is embedded in every
checkpoint so ``infer -m ckpt`` can rebuild the entire task with no config
file (base_trainer.py:136-142, tasks/__init__.py:14-22) — while the state
is a nested numpy pytree ({params, codebook, opt_state, ...} per module)
instead of torch state_dicts.

Also ports: latest-checkpoint discovery for auto-resume
(base_trainer.py:104-134), module-regex partial loading and multi-file
stitching (utils.py:207-250), and keep-every-N GC (utils.py:253-270).
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Optional

import jax
import numpy as np

CKPT_PREFIX = "model_"


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state_tree, iteration: int, config: dict):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "iteration": int(iteration),
        "config": config,
        "state": _to_numpy_tree(state_tree),
        "format": "msmctts_tpu/v1",
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def checkpoint_step(path: str) -> int:
    m = re.search(r"model_(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def find_latest_checkpoint(save_dir: str) -> Optional[str]:
    if not os.path.isdir(save_dir):
        return None
    cands = [
        os.path.join(save_dir, f)
        for f in os.listdir(save_dir)
        if f.startswith(CKPT_PREFIX) and not f.endswith(".tmp")
    ]
    if not cands:
        return None
    return max(cands, key=checkpoint_step)


def clean_checkpoint_directory(save_dir: str, interval: int, keep_last: int = 2):
    """Remove snapshots whose step is not a multiple of ``interval``,
    keeping the newest ``keep_last`` regardless (reference utils.py:260-270
    keeps every-interval snapshots)."""
    if not os.path.isdir(save_dir):
        return
    cands = sorted(
        (
            os.path.join(save_dir, f)
            for f in os.listdir(save_dir)
            if f.startswith(CKPT_PREFIX) and not f.endswith(".tmp")
        ),
        key=checkpoint_step,
    )
    for path in cands[:-keep_last]:
        step = checkpoint_step(path)
        if interval > 0 and step % interval != 0:
            os.remove(path)


def filter_state_by_regex(state: dict, pattern: str) -> dict:
    """Subtree of a nested state dict whose '/'-joined paths match
    ``pattern`` — the reference's module-regex partial load
    (utils.py:234-238)."""
    import flax

    rx = re.compile(pattern)
    flat = flax.traverse_util.flatten_dict(state)
    kept = {k: v for k, v in flat.items() if rx.search("/".join(map(str, k)))}
    return flax.traverse_util.unflatten_dict(kept)


def merge_states(base: dict, overlay: dict) -> dict:
    """Recursively overlay matching leaves (checkpoint stitching,
    utils.py:209-221)."""
    import flax

    fb = flax.traverse_util.flatten_dict(base)
    fo = flax.traverse_util.flatten_dict(overlay)
    for k, v in fo.items():
        if k in fb:
            fb[k] = v
    return flax.traverse_util.unflatten_dict(fb)
