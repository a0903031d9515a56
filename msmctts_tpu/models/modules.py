"""WaveNet-style gated residual stack and prior predictor blocks.

Reimplements the reference's ``ResStack`` (vqgantts/modules.py:182-259) and
``PriorPredictor`` (msmc_vqgan.py:65-88) in NLC layout with explicit
weight-norm convs. The fused tanh*sigmoid gate the reference jit-scripts
(modules.py:172-179) is left to XLA elementwise fusion.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from msmctts_tpu.ops.convs import WNConv


class TorchBatchNorm(nn.Module):
    """``nn.BatchNorm1d(C, eps=1e-5, affine=False)`` semantics over NLC
    inputs (the quantizer preprocessor's ``norm: True`` surface, reference
    msmc_vqgan.py:115-123).

    Differences from flax ``nn.BatchNorm`` that matter for parity:
    running statistics update with torch's momentum convention
    (``running = (1-m)*running + m*batch``, m=0.1) and the *unbiased*
    batch variance (Bessel's n/(n-1)), while normalization uses the biased
    variance — exactly torch's train-mode split. Eval normalizes with the
    tracked running stats (the reference behavior flax's
    ``use_running_average=False`` misses). Stats live in the standard
    'batch_stats' collection and update only when the caller marks it
    mutable."""

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        C = x.shape[-1]
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        if use_running_average:
            m, v = mean.value, var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))  # reduce over (B, T)
            m = jnp.mean(xf, axis=axes)
            v = jnp.mean(jnp.square(xf - m), axis=axes)  # biased, for norm
            if self.is_mutable_collection("batch_stats"):
                n = 1
                for a in axes:
                    n *= x.shape[a]
                bessel = n / max(n - 1, 1)
                mean.value = (1 - self.momentum) * mean.value + self.momentum * m
                var.value = (
                    (1 - self.momentum) * var.value + self.momentum * v * bessel
                )
        y = (x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + self.eps)
        return y.astype(x.dtype)


class ResStack(nn.Module):
    """Non-causal gated conv stack with residual/skip split.

    x, mask: [B, T, C], [B, T, 1] (1 = valid). Optional global conditioning
    g [B, 1, gin_channels].
    """

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, g: Optional[jax.Array] = None, deterministic: bool = True):
        C = self.hidden_channels
        output = jnp.zeros_like(x)
        if g is not None:
            g_all = WNConv(2 * C * self.n_layers, (1,), name="cond_layer")(g)

        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            padding = (self.kernel_size * dilation - dilation) // 2
            x_in = WNConv(
                2 * C,
                (self.kernel_size,),
                padding=padding,
                dilation=dilation,
                name=f"in_{i}",
            )(x)
            if g is not None:
                x_in = x_in + g_all[..., i * 2 * C : (i + 1) * 2 * C]
            acts = jnp.tanh(x_in[..., :C]) * jax.nn.sigmoid(x_in[..., C:])
            acts = nn.Dropout(self.p_dropout)(acts, deterministic=deterministic)

            last = i == self.n_layers - 1
            res_skip = WNConv(C if last else 2 * C, (1,), name=f"res_skip_{i}")(acts)
            if not last:
                x = (x + res_skip[..., :C]) * mask
                output = output + res_skip[..., C:]
            else:
                output = output + res_skip
        return output * mask


class Encoder(nn.Module):
    """pre-1x1 -> ResStack -> 1x1 projection (reference
    vqgantts/modules.py:262-289; unused by the v2 path but part of the
    module surface)."""

    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        h = nn.Dense(self.hidden_channels, name="pre")(x) * mask
        h = ResStack(
            hidden_channels=self.hidden_channels,
            kernel_size=self.kernel_size,
            dilation_rate=self.dilation_rate,
            n_layers=self.n_layers,
            name="enc",
        )(h, mask, deterministic=deterministic)
        return nn.Dense(self.out_channels, name="proj")(h) * mask


class PriorPredictor(nn.Module):
    """ResStack + 1x1 projection predicting the next stage's
    pre-quantization embedding from the running residual
    (msmc_vqgan.py:65-88). Returns (hidden, projection)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4
    # extra surface vs the reference (which hard-wires ResStack's 0.1,
    # msmc_vqgan.py:82): lets tests/configs control the stack dropout
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        h = ResStack(
            hidden_channels=self.in_channels,
            kernel_size=self.kernel_size,
            dilation_rate=self.dilation_rate,
            n_layers=self.n_layers,
            p_dropout=self.p_dropout,
            name="enc",
        )(x, mask, deterministic=deterministic)
        # 1x1 projection (a Dense over the channel dim in NLC layout)
        proj = nn.Dense(self.out_channels, name="proj")(h) * mask
        return h, proj
