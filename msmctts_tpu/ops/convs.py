"""Weight-normalized convolution modules (NLC / NHWC layouts).

The reference leans on torch's ``weight_norm`` parametrization throughout
HiFi-GAN and the WaveNet ResStack (hifigan/common.py, vqgantts/modules.py).
Here weight norm is an explicit parametrization: direction ``v`` plus scale
``g`` with ``kernel = g * v / ||v||``, where the norm is taken over all axes
except the one torch's default ``dim=0`` keeps — output channels for
convolutions, *input* channels for transposed convolutions (torch stores
transposed weights [in, out, k], so dim=0 is the input axis).

At init ``g = ||v||`` so the effective kernel equals ``v``'s init, matching
torch. ``remove_weight_norm`` for deployment is the identity here: callers
fold ``g``/``v`` into a dense kernel via ``fold_weight_norm`` on the params
pytree.

Activations are channels-last ([B, T, C] / [B, H, W, C]) so the channel dim
rides the TPU lane dimension; kernels are [k..., in, out].
"""

from __future__ import annotations

from typing import Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _wn_kernel(v, g, norm_axes):
    # normalization always in float32: under bf16 compute the direction
    # norm must not be computed in half precision
    v = v.astype(jnp.float32)
    g = g.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=norm_axes, keepdims=True))
    shape = [1] * v.ndim
    for ax in range(v.ndim):
        if ax not in norm_axes:
            shape[ax] = v.shape[ax]
    return v / jnp.maximum(norm, 1e-12) * g.reshape(shape)


class WNConv(nn.Module):
    """Weight-normalized N-D convolution over channels-last input.

    padding: int or per-spatial-dim (lo, hi) pairs (torch-style symmetric
    when int). ``kernel_init`` defaults to the normal(0, 0.01) HiFi-GAN init
    when ``hifigan_init`` else lecun_normal.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence] = 0
    dilation: Union[int, Sequence[int]] = 1
    use_bias: bool = True
    hifigan_init: bool = False

    @nn.compact
    def __call__(self, x):
        ndim = len(self.kernel_size)
        in_ch = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_ch, self.features)

        if self.hifigan_init:
            init = nn.initializers.normal(stddev=0.01)
        else:
            init = nn.initializers.lecun_normal()
        v = self.param("v", init, kshape)
        norm_axes = tuple(range(ndim)) + (ndim,)  # all but out-channel axis

        def g_init(key):
            return jnp.sqrt(jnp.sum(jnp.square(v), axis=norm_axes))

        g = self.param("g", lambda key: g_init(key))
        kernel = _wn_kernel(v, g, norm_axes)

        strides = (self.strides,) * ndim if isinstance(self.strides, int) else tuple(self.strides)
        dilation = (self.dilation,) * ndim if isinstance(self.dilation, int) else tuple(self.dilation)
        if isinstance(self.padding, int):
            padding = [(self.padding, self.padding)] * ndim
        else:
            padding = [tuple(p) if not isinstance(p, int) else (p, p) for p in self.padding]

        spatial = "".join("HWD"[i] for i in range(ndim)) if ndim <= 3 else None
        dn = (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")
        out = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=strides,
            padding=padding,
            rhs_dilation=dilation,
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(out.dtype)
        return out


class WNConvTranspose1d(nn.Module):
    """Weight-normalized 1-D transposed conv, exact torch semantics:
    out_len = (L-1)*stride - 2*padding + kernel_size.

    Implemented as lhs-dilated correlation with a tap-flipped kernel, which
    XLA lowers to an MXU-friendly strided conv. Weight norm normalizes per
    *input* channel (torch dim=0 on [in, out, k] weights).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    use_bias: bool = True
    hifigan_init: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = (self.kernel_size, in_ch, self.features)
        if self.hifigan_init:
            init = nn.initializers.normal(stddev=0.01)
        else:
            init = nn.initializers.lecun_normal()
        v = self.param("v", init, kshape)
        norm_axes = (0, 2)  # per-input-channel norm (torch transposed dim=0)

        def g_init(key):
            return jnp.sqrt(jnp.sum(jnp.square(v), axis=norm_axes))

        g = self.param("g", lambda key: g_init(key))
        kernel = _wn_kernel(v, g, norm_axes)

        k, p, u = self.kernel_size, self.padding, self.stride
        out = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=0).astype(x.dtype),
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p)],
            lhs_dilation=(u,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(out.dtype)
        return out


def fold_weight_norm(params):
    """Fold every {v, g} pair in a params pytree into a dense kernel stored
    back in 'v' (deployment-time equivalent of the reference's
    ``remove_weight_norm``, hifigan/generator.py:57-64). Because the folded
    kernel's per-channel norm equals g, re-normalizing it is the identity —
    so the folded tree is directly usable by the same modules, and folding is
    idempotent. Provided for export tooling rather than the hot path (XLA
    constant-folds the normalization when params are donated constants)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = dict(flat)
    for path, value in flat.items():
        if path[-1] == "v":
            g_path = path[:-1] + ("g",)
            if g_path in flat:
                v = np.asarray(value)
                ndim = v.ndim
                norm_axes = tuple(ax for ax in range(ndim) if ax != ndim - 1)
                # transposed convs norm over (0, 2); detect by g shape
                g = np.asarray(flat[g_path])
                if ndim >= 2 and g.shape[0] == v.shape[-2] and g.shape[0] != v.shape[-1]:
                    norm_axes = tuple(ax for ax in range(ndim) if ax != ndim - 2)
                norm = np.sqrt(np.sum(v**2, axis=norm_axes, keepdims=True))
                shape = [1] * ndim
                for ax in range(ndim):
                    if ax not in norm_axes:
                        shape[ax] = v.shape[ax]
                out[path] = v / np.maximum(norm, 1e-12) * g.reshape(shape)
    return flax.traverse_util.unflatten_dict(out)
