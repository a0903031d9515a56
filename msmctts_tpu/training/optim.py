"""Per-module optimizers + LR schedules (optax).

The reference builds one optimizer per top-level task sub-module from the
``optimizer.<name>`` / ``optimizer._default`` config subtrees
(trainers/optimizers/__init__.py:24-79) and applies a shared multiplicative
LR schedule each step (lr_schedulers/exponential_lr.py:4-31). Here each
sub-module gets one optax chain with the schedule baked in; state lives in
the train-state pytree and updates happen inside the jitted step.
"""

from __future__ import annotations

import re
from typing import Optional

import jax.numpy as jnp
import optax


def make_lr_schedule(base_lr: float, cfg: Optional[dict]):
    """ExponentialDecayLRScheduler semantics: scale 1 until warmup_steps,
    then decay_learning_rate^((step - warmup)/decay_scale), floored at
    final_learning_rate (exponential_lr.py:24-31)."""
    if not cfg or cfg.get("_name") not in (None, "ExponentialDecayLRScheduler"):
        if cfg and cfg.get("_name") is not None:
            raise ValueError(f"unknown lr scheduler {cfg.get('_name')}")
    cfg = cfg or {}
    warmup = float(cfg.get("warmup_steps", 0))
    decay_scale = float(cfg.get("decay_scale", 1))
    decay_lr = float(cfg.get("decay_learning_rate", 1.0))
    final_lr = float(cfg.get("final_learning_rate", 0.0))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        scale = jnp.where(
            step < warmup, 1.0, jnp.power(decay_lr, (step - warmup) / decay_scale)
        )
        return jnp.maximum(base_lr * scale, final_lr)

    return schedule


def build_optimizer(
    opt_cfg: dict,
    lr_cfg: Optional[dict],
    grad_clip: Optional[float] = None,
    freeze_patterns=None,
):
    """One optax transform from an ``optimizer.<module>`` config node.

    Supported ``_name``: Adam, AdamW, RAdam (optimizers/__init__.py:8-21).
    ``grad_clip`` prepends global-norm clipping (the reference clips
    per-module before step, msmctts_trainer.py:205-206);
    ``freeze_patterns`` appends zero-updates for regex-matched params.
    """
    name = opt_cfg.get("_name", "Adam")
    lr = float(opt_cfg.get("learning_rate", 2e-4))
    betas = opt_cfg.get("betas", [0.9, 0.999])
    eps = float(opt_cfg.get("eps", 1e-8))
    wd = float(opt_cfg.get("weight_decay", 0.0))
    schedule = make_lr_schedule(lr, lr_cfg)

    if name == "Adam":
        tx = optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps)
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    elif name == "AdamW":
        tx = optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd)
    elif name == "RAdam":
        tx = optax.radam(schedule, b1=betas[0], b2=betas[1], eps=eps)
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    else:
        raise ValueError(f"unknown optimizer '{name}'")

    if grad_clip is not None and grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(float(grad_clip)), tx)
    if freeze_patterns:
        # reference ``config.freeze`` regex freezing (base_trainer.py:25-28):
        # matched parameters receive zero updates.
        def frozen_mask(params):
            import flax

            regexes = [re.compile(p) for p in freeze_patterns]
            flat = flax.traverse_util.flatten_dict(params)
            mask = {
                path: any(r.search("/".join(map(str, path))) for r in regexes)
                for path in flat
            }
            return flax.traverse_util.unflatten_dict(mask)

        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen_mask))
    return tx


def optimizer_config_for(config: dict, module_name: str) -> dict:
    """``optimizer.<name>`` with ``optimizer._default`` fallback
    (optimizers/__init__.py:27-35)."""
    opt = config.get("optimizer", {}) or {}
    node = opt.get(module_name, opt.get("_default", {"_name": "Adam"}))
    return dict(node)
