"""Tensor-parallel parameter sharding over a 2-D ``data`` x ``model`` mesh.

The reference's only parallelism is data parallelism (NCCL allreduce,
distributed/distributed.py — SURVEY.md 2.9). This module goes beyond it the
TPU-native way: parameters get Megatron-style PartitionSpecs over a
``model`` mesh axis and XLA GSPMD inserts the collectives. Because
sharding annotations never change the math (only the reduction layout),
tensor-parallel training is numerically equivalent to single-device
training up to reduction order — asserted by tests/test_parallel.py.

Pairing scheme (one all-reduce per paired block, riding ICI):

  * FFT-block attention: the fused ``qkv`` projection is column-parallel
    (heads shard over ``model``), the ``out`` projection row-parallel.
  * FFT-block ConvFFN: ``w1`` column-parallel, ``w2`` row-parallel.
  * HiFi-GAN MRF resblocks: ``conv1_*`` column-parallel, ``conv2_*``
    row-parallel (their weight-norm ``g``/``bias`` follow the out-channel
    sharding; a row-parallel conv's per-out-channel ``g`` stays replicated).

Everything else — codebooks (EMA statistics must stay global), embeddings,
pre/post convs, upsamplers, norms — is replicated over ``model`` and
sharded over nothing. A dimension that does not divide the ``model`` axis
size falls back to replication, so any model works on any mesh.

Optimizer state is sharded by the same rules: optax's Adam/RAdam moments
mirror the params tree, so the path-based matching applies transparently.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh_2d(
    n_data: int = -1, n_model: int = 1, devices=None
) -> Mesh:
    """``data`` x ``model`` mesh. ``n_data=-1`` uses all remaining devices.

    The ``model`` axis is laid out over adjacent devices (fastest-varying)
    so tensor-parallel collectives ride the shortest ICI hops.
    """
    if devices is None:
        devices = jax.devices()
    n_model = max(int(n_model), 1)
    if n_data in (-1, None):
        n_data = len(devices) // n_model
    total = n_data * n_model
    assert total <= len(devices), (
        f"mesh {n_data}x{n_model} needs {total} devices, have {len(devices)}"
    )
    grid = np.asarray(devices[:total]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


# (path regex, dim to shard) — dims count from the END of the shape so the
# same rule covers Dense [in, out] and Conv [k..., in, out] kernels.
# dim=-1: output/column-parallel; dim=-2: input/row-parallel; dim=0 over a
# 1-D leaf: per-out-channel vectors (bias/weight-norm g) of column-parallel
# layers.
_COLUMN = -1
_ROW = -2
_RULES = [
    # FFT-block attention (models/transformer.py): fused QKV column-parallel
    # (sharding the H*d_out dim over head groups), out row-parallel.
    (re.compile(r"/qkv/(kernel|v)$"), _COLUMN),
    (re.compile(r"/qkv/bias$"), 0),
    (re.compile(r"/out/(kernel|v)$"), _ROW),
    # FFT-block ConvFFN: w1 column-parallel, w2 row-parallel.
    (re.compile(r"/w1/(kernel|v)$"), _COLUMN),
    (re.compile(r"/w1/(bias|g)$"), 0),
    (re.compile(r"/w2/(kernel|v)$"), _ROW),
    # HiFi-GAN MRF resblocks (models/hifigan.py): conv1_* column-parallel,
    # conv2_* row-parallel. ResBlock2's single conv_* stays replicated (it
    # has no pair).
    (re.compile(r"/conv1_\d+/v$"), _COLUMN),
    (re.compile(r"/conv1_\d+/(bias|g)$"), 0),
    (re.compile(r"/conv2_\d+/v$"), _ROW),
]


def _spec_for(path: str, shape, n_model: int) -> P:
    for pattern, dim in _RULES:
        if pattern.search(path):
            if dim == 0:
                if len(shape) == 1 and shape[0] % n_model == 0:
                    return P(MODEL_AXIS)
                return P()
            axis = len(shape) + dim
            if 0 <= axis < len(shape) and shape[axis] % n_model == 0:
                return P(*([None] * axis + [MODEL_AXIS]))
            return P()
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        name = getattr(p, "key", None)
        if name is None:
            name = getattr(p, "name", None)
        if name is None:
            name = getattr(p, "idx", None)
        parts.append(str(name))
    return "/" + "/".join(parts)


def state_shardings(state, mesh: Mesh):
    """PartitionSpec pytree for a train-state (params/opt_state/codebook...).

    With no ``model`` axis (or size 1) everything is replicated — identical
    to ``replicate_state``. Codebook state never matches a rule, so the EMA
    statistics remain global (psum over ``data`` only).
    """
    n_model = dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)

    def spec(path, leaf):
        if n_model <= 1:
            return NamedSharding(mesh, P())
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, _spec_for(_path_str(path), shape, n_model))

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_state(state, mesh: Mesh):
    """Place a train-state pytree on the mesh: tensor-parallel params where
    the rules apply, replicated otherwise. Drop-in superset of
    ``replicate_state`` (exact same placement when the mesh is 1-D)."""
    shardings = state_shardings(state, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, shardings
    )


def mesh_from_config(config, devices=None) -> Mesh:
    """Build the training mesh from the config's ``mesh:`` node
    (``{data: -1, model: 1}`` semantics; -1 = all remaining devices)."""
    node = dict(config.get("mesh") or {}) if config is not None else {}
    n_model = int(node.get(MODEL_AXIS, 1) or 1)
    n_data = int(node.get(DATA_AXIS, -1) or -1)
    if n_model <= 1:
        from msmctts_tpu.parallel.mesh import make_mesh

        return make_mesh(None if n_data in (-1, None) else n_data)
    return make_mesh_2d(n_data, n_model, devices)
