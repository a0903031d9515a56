"""Mixed-precision policy: bf16 compute over fp32 masters.

The reference's fp16 path is vestigial (fp16_training hard-coded False,
dead GradScaler — base_trainer.py:23,35-36; SURVEY.md 5). On TPU the
right policy is bfloat16: no loss scaling needed, MXU-native.

Policy (config key ``precision: bfloat16``):
  * parameters are stored float32 (optimizer masters);
  * inside the jitted step, params and float inputs are cast to bf16, so
    every matmul/conv runs bf16xbf16 on the MXU;
  * the cast's transpose accumulates gradients back in float32;
  * numerically-critical paths stay float32 regardless: VQ distances and
    EMA statistics (models/quantizer.py), STFT bases and all loss math
    (ops/stft.py, training/losses.py), LayerNorm statistics are computed
    on the bf16 activations by flax in float32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_dtype(config) -> jnp.dtype:
    name = str(config.get("precision", "float32")).lower()
    if name in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if name in ("fp32", "float32"):
        return jnp.float32
    raise ValueError(f"unknown precision '{name}'")


def cast_floats(tree, dtype):
    """Cast float leaves of a pytree to ``dtype`` (ints/bools untouched)."""
    if dtype == jnp.float32:
        return tree

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)
