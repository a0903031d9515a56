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
import shutil
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


_ORBAX_ASYNC = None


def _orbax_async():
    """Process-wide AsyncCheckpointer (orbax serializes queued saves)."""
    global _ORBAX_ASYNC
    if _ORBAX_ASYNC is None:
        import orbax.checkpoint as ocp

        _ORBAX_ASYNC = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ORBAX_ASYNC


def save_checkpoint_orbax(path: str, state_tree, iteration: int, config: dict):
    """Orbax-backed snapshot (``checkpoint_backend: orbax``): ``path`` is a
    DIRECTORY with a small ``meta.pkl`` (iteration + embedded config — the
    reference's self-describing property) and the state under ``state/``
    written by an ASYNC orbax checkpointer, so the train loop is not
    stalled by serialization. On multi-host/sharded state orbax writes
    per-shard without gathering to host 0 (the pickle backend gathers).
    ``load_checkpoint`` reads either backend transparently."""
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    if os.path.isdir(tmp):  # stale tmp from a crashed save
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "meta.pkl"), "wb") as f:
        pickle.dump(
            {"iteration": int(iteration), "config": config,
             "format": "msmctts_tpu/orbax-v1"},
            f, protocol=4,
        )
    if os.path.exists(path):
        # Re-save to an existing snapshot path (e.g. relaunching a completed
        # run, whose final save targets the same iteration): os.replace
        # cannot overwrite a non-empty directory, and an in-flight async
        # write into it must land before it is removed.
        wait_for_pending_saves()
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)
    os.replace(tmp, path)  # meta visible only when complete
    _orbax_async().save(
        os.path.join(path, "state"), state_tree, force=True
    )


def wait_for_pending_saves():
    """Block until queued async (orbax) snapshot writes are durable — call
    before process exit (preemption path) or before reading a snapshot
    that may still be in flight."""
    if _ORBAX_ASYNC is not None:
        _ORBAX_ASYNC.wait_until_finished()


def load_checkpoint(path: str, target=None) -> dict:
    """Read a snapshot of either backend. ``target`` (optional, orbax
    only): a structurally-matching pytree template — needed to restore
    non-dict containers (optax NamedTuple states) with their real types;
    without it orbax yields plain nested dicts (fine for params-only
    consumers like infer)."""
    if os.path.isdir(path):  # orbax backend layout
        wait_for_pending_saves()
        with open(os.path.join(path, "meta.pkl"), "rb") as f:
            payload = pickle.load(f)
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            state_dir = os.path.join(path, "state")
            payload["state"] = ckptr.restore(state_dir, target)
        return payload
    with open(path, "rb") as f:
        return pickle.load(f)


def checkpoint_step(path: str) -> int:
    m = re.search(r"model_(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def _is_complete_snapshot(path: str) -> bool:
    if not os.path.isdir(path):
        return True  # pickle file (written atomically via rename)
    # orbax layout: a crash between the meta rename and the async state
    # commit leaves meta.pkl without a state/ dir — not loadable, skip
    return os.path.isfile(os.path.join(path, "meta.pkl")) and os.path.isdir(
        os.path.join(path, "state")
    )


def find_latest_checkpoint(save_dir: str) -> Optional[str]:
    if not os.path.isdir(save_dir):
        return None
    cands = [
        p
        for f in os.listdir(save_dir)
        if f.startswith(CKPT_PREFIX) and not f.endswith(".tmp")
        and _is_complete_snapshot(p := os.path.join(save_dir, f))
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
            if os.path.isdir(path):  # orbax snapshot directory
                import shutil

                shutil.rmtree(path)
            else:
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
