"""Speaker-embedding networks: ECAPA-TDNN and x-vector TDNN (TPU/JAX).

Re-design of the reference ``vqgantts/tdnn.py``:
  * ``ECAPA_TDNN`` (tdnn.py:180-244): Conv1dReluBn stem, three SE-Res2Blocks
    (dilations 2/3/4), 1x1 conv over the concatenation, attentive stats
    pooling, BN + linear + BN head. Used as the QS-TTS ``global_encoder``.
  * ``manipulate`` (tdnn.py:215-244): mixes attentive statistics across a
    list of reference utterances with weights (voice morphing).
  * ``XVectorTDNN`` (tdnn.py:7-60).

Layout is NLC; BatchNorm keeps running stats in the 'batch_stats'
collection (torch momentum 0.1 == flax momentum 0.9).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (0.1)


class ConvReluBn(nn.Module):
    """conv1d -> relu -> BN (reference Conv1dReluBn, tdnn.py:109-117)."""

    features: int
    kernel_size: int = 1
    dilation: int = 1
    padding: int = 0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(
            self.features,
            (self.kernel_size,),
            kernel_dilation=self.dilation,
            padding=self.padding,
            use_bias=self.use_bias,
        )(x)
        h = jax.nn.relu(h)
        return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(h)


class Res2ConvReluBn(nn.Module):
    """Res2Net-style split conv (tdnn.py:68-104): channels split into
    ``scale`` groups; each group (after the first) is summed with the
    previous group's output before its conv."""

    channels: int
    kernel_size: int = 1
    dilation: int = 1
    padding: int = 0
    scale: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.channels % self.scale == 0
        width = self.channels // self.scale
        nums = self.scale if self.scale == 1 else self.scale - 1
        splits = [x[..., i * width : (i + 1) * width] for i in range(self.scale)]
        out = []
        sp = None
        for i in range(nums):
            sp = splits[i] if i == 0 else sp + splits[i]
            sp = nn.Conv(
                width,
                (self.kernel_size,),
                kernel_dilation=self.dilation,
                padding=self.padding,
                use_bias=False,
                name=f"conv_{i}",
            )(sp)
            sp = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, name=f"bn_{i}"
            )(jax.nn.relu(sp))
            out.append(sp)
        if self.scale != 1:
            out.append(splits[nums])
        return jnp.concatenate(out, axis=-1)


class SEConnect(nn.Module):
    """Squeeze-excite over time mean (tdnn.py:122-135)."""

    channels: int
    s: int = 2

    @nn.compact
    def __call__(self, x):
        out = jnp.mean(x, axis=1)  # [B, C]
        out = jax.nn.relu(nn.Dense(self.channels // self.s)(out))
        out = jax.nn.sigmoid(nn.Dense(self.channels)(out))
        return x * out[:, None, :]


class SERes2Block(nn.Module):
    """1x1 -> Res2Conv -> 1x1 -> SE, residual added outside-in
    (tdnn.py:141-152)."""

    channels: int
    kernel_size: int
    dilation: int
    padding: int
    scale: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvReluBn(self.channels, 1, name="in")(x, train)
        h = Res2ConvReluBn(
            self.channels,
            self.kernel_size,
            self.dilation,
            self.padding,
            self.scale,
            name="res2",
        )(h, train)
        h = ConvReluBn(self.channels, 1, name="out")(h, train)
        h = SEConnect(self.channels, name="se")(h)
        return x + h


class AttentiveStatsPool(nn.Module):
    """Attentive weighted mean/std pooling (tdnn.py:157-172)."""

    bottleneck_dim: int = 128

    @nn.compact
    def __call__(self, x):
        # x [B, T, C]
        alpha = jnp.tanh(nn.Dense(self.bottleneck_dim)(x))
        alpha = jax.nn.softmax(nn.Dense(x.shape[-1])(alpha), axis=1)
        mean = jnp.sum(alpha * x, axis=1)
        residuals = jnp.sum(alpha * x * x, axis=1) - mean * mean
        std = jnp.sqrt(jnp.clip(residuals, min=1e-9))
        return jnp.concatenate([mean, std], axis=-1)

    def stats(self, x):
        return self(x)


class ECAPA_TDNN(nn.Module):
    """[B, T, in_channels] (e.g. mel) -> [B, embd_dim] speaker embedding."""

    in_channels: int = 80
    embd_dim: int = 192
    channels: int = 512
    scale: int = 8

    def setup(self):
        C = self.channels
        self.layer1 = ConvReluBn(C, 5, padding=2, name="layer1")
        self.layer2 = SERes2Block(C, 3, 2, 2, self.scale, name="layer2")
        self.layer3 = SERes2Block(C, 3, 3, 3, self.scale, name="layer3")
        self.layer4 = SERes2Block(C, 3, 4, 4, self.scale, name="layer4")
        self.conv = nn.Dense(C * 3, name="conv")  # 1x1 conv == dense in NLC
        self.pooling = AttentiveStatsPool(128, name="pooling")
        self.bn1 = nn.BatchNorm(momentum=BN_MOMENTUM, name="bn1")
        self.linear = nn.Dense(self.embd_dim, name="linear")
        self.bn2 = nn.BatchNorm(momentum=BN_MOMENTUM, name="bn2")

    def _stats(self, x, train):
        out1 = self.layer1(x, train)
        out2 = self.layer2(out1, train)
        out3 = self.layer3(out2, train)
        out4 = self.layer4(out3, train)
        out = jnp.concatenate([out2, out3, out4], axis=-1)
        out = jax.nn.relu(self.conv(out))
        return self.pooling(out)

    def __call__(self, x, train: bool = False):
        mean_std = self._stats(x, train)
        out = self.bn1(mean_std, use_running_average=not train)
        out = self.bn2(self.linear(out), use_running_average=not train)
        return out

    def manipulate(self, refs: Sequence[jax.Array], alpha: jax.Array, train: bool = False):
        """Weighted mixing of per-reference statistics (tdnn.py:215-244):
        means combined linearly, stds combined log-linearly."""
        means, stds = [], []
        for i, seq in enumerate(refs):
            mean_std = self._stats(seq, train)
            mean, std = jnp.split(mean_std, 2, axis=-1)
            means.append(mean * alpha[:, i : i + 1])
            stds.append(jnp.log(jnp.clip(std, min=1e-9)) * alpha[:, i : i + 1])
        mixed = jnp.concatenate([sum(means), jnp.exp(sum(stds))], axis=-1)
        out = self.bn1(mixed, use_running_average=not train)
        return self.bn2(self.linear(out), use_running_average=not train)


class XVectorTDNN(nn.Module):
    """Classic x-vector (tdnn.py:7-60): 5 TDNN conv layers, mean/std stats
    pooling, 3 FC layers. Training-time feature noise handled by the caller
    through the 'noise' rng."""

    in_channels: int
    out_channels: int
    p_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False, eps: float = 1e-5):
        plan = [(512, 5, 1), (512, 5, 2), (512, 7, 3), (512, 1, 1), (1500, 1, 1)]
        h = x
        for i, (c, k, d) in enumerate(plan):
            h = nn.Conv(c, (k,), kernel_dilation=d, padding="VALID", name=f"tdnn{i + 1}")(h)
            h = jax.nn.relu(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, name=f"bn{i + 1}"
            )(h)
            h = nn.Dropout(self.p_dropout)(h, deterministic=not train)
        if train:
            h = h + eps * jax.random.normal(self.make_rng("noise"), h.shape, h.dtype)
        stats = jnp.concatenate([jnp.mean(h, axis=1), jnp.std(h, axis=1)], axis=-1)
        h = stats
        for i, c in enumerate((512, 512)):
            h = nn.Dense(c, name=f"fc{i + 1}")(h)
            h = jax.nn.relu(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, name=f"bn_fc{i + 1}"
            )(h)
            h = nn.Dropout(self.p_dropout)(h, deterministic=not train)
        return nn.Dense(self.out_channels, name="fc3")(h)
