"""Fused dilated-residual-layer kernel parity vs an XLA reference
implementation (interpret mode on CPU; same kernel compiles for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msmctts_tpu.ops.pallas_resblock import LRELU_SLOPE, fused_resblock_layer


def xla_reference(x, w1, b1, w2, b2, dilation):
    def lrelu(v):
        return jnp.where(v >= 0, v, LRELU_SLOPE * v)

    def conv(v, w, b, d):
        # w [k, C, C] tap-major; torch 'same' padding
        k = w.shape[0]
        pad = (k - 1) // 2 * d
        out = jax.lax.conv_general_dilated(
            v, w,
            window_strides=(1,),
            padding=[(pad, pad)],
            rhs_dilation=(d,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        return out + b
    h = conv(lrelu(x), w1, b1, dilation)
    return x + conv(lrelu(h), w2, b2, 1)


@pytest.mark.parametrize("k,dilation,T", [(3, 1, 700), (3, 5, 512), (11, 3, 300)])
def test_fused_layer_matches_xla(rng, k, dilation, T):
    B, C = 2, 128
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(k, C, C)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(k, C, C)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)

    got = fused_resblock_layer(x, w1, b1, w2, b2, dilation, interpret=True)
    want = xla_reference(x, w1, b1, w2, b2, dilation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
