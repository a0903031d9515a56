"""Device mesh + sharding for data-parallel training.

Replaces the reference's NCCL process-group + hand-rolled gradient allreduce
(msmctts/distributed/distributed.py:21-204, SURVEY.md 2.9) with the JAX SPMD
model: one ``jax.sharding.Mesh`` over all addressable devices, batches
sharded over the ``data`` axis, parameters/optimizer state replicated. XLA
inserts the gradient all-reduces; because the EMA codebook statistics are
computed as *global* masked sums inside the jitted step, they are psum'd
across the mesh before the EMA update — multi-chip VQ training is therefore
bit-identical to single-chip (the reference's per-rank codebooks drift,
distributed.py:160-163 only broadcasts once at init).

Multi-host: each process feeds its local shard of the global batch via
``jax.make_array_from_process_local_data`` (the DistributedSampler
equivalent is the loader's ``shard=(process_index, process_count)``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices
    (default: all)."""
    devices = jax.devices()
    if n_devices is not None and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis sharding for batch leaves."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    """Place a host-side numpy batch onto the mesh, sharded over the batch
    dimension. Works single- and multi-host: under multi-host each process
    passes its local shard and the result is a global jax.Array."""
    sharding = batch_sharding(mesh, axis)

    def put(x):
        x = np.asarray(x)
        spec = P(axis) if x.ndim >= 1 else P()
        s = NamedSharding(mesh, spec)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(s, x)
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, batch)


def host_local_rows(x, n: int = 1) -> np.ndarray:
    """First ``n`` rows of the PROCESS-LOCAL data of ``x`` (numpy).

    Safe on process-spanning global arrays where ``np.asarray(x[:n])``
    would raise (non-addressable devices): reads the first addressable
    shard instead, which under the loader's contiguous-block sharding is
    the head of this process's block (on process 0: global row 0)."""
    if hasattr(x, "addressable_data"):
        shard = np.asarray(x.addressable_data(0))
        if shard.ndim and shard.shape[0] >= n:
            return shard[:n]
        x = shard  # 0-d or shard smaller than n: fall through
    return np.asarray(x)[:n]


def replicate_state(state, mesh: Mesh):
    """Replicate a train-state pytree across the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), state)


def pad_batch_to_devices(batch: dict, n: int) -> dict:
    """Pad every leaf's leading dim up to a multiple of ``n`` (repeat-edge),
    so any batch size divides the mesh. Loss masking makes the padded rows
    inert in the mean only if lengths are zeroed — instead we repeat real
    rows, which only slightly re-weights the batch mean (and only when the
    configured batch size does not divide the device count)."""
    B = next(iter(batch.values())).shape[0]
    if B % n == 0:
        return batch
    pad = n - (B % n)

    def f(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] != B:
            return x
        reps = x[np.arange(pad) % B]
        return np.concatenate([x, reps], axis=0)

    return {k: f(v) for k, v in batch.items()}
