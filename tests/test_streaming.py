"""Streaming decode: chunked HiFi-GAN output must EQUAL the monolithic
decode (msmctts_tpu/streaming.py). The generator has a finite receptive
field (receptive_field_frames), edges are anchored, so equality is exact
— these tests assert it bitwise, across chunk sizes, utterance lengths,
and the real CSMSC decoder geometry, plus the int8 serving decoder with
static calibrated scales."""

import jax
import jax.numpy as jnp
import numpy as np

from msmctts_tpu.models.hifigan import HifiGANGenerator, receptive_field_frames
from msmctts_tpu.streaming import StreamingDecoder

TINY_CFG = dict(
    upsample_rates=[2, 2],
    upsample_kernel_sizes=[4, 4],
    upsample_initial_channel=32,
    resblock_kernel_sizes=[3],
    resblock_dilation_sizes=[[1, 3]],
)

# The shipped CSMSC recipe's geometry (rates/kernels set the receptive
# field; channels shrunk to keep the test fast).
CSMSC_CFG = dict(
    upsample_rates=[6, 5, 5, 2],
    upsample_kernel_sizes=[12, 11, 11, 4],
    upsample_initial_channel=32,
    resblock_kernel_sizes=[3, 7, 11],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
)


def _build(cfg, num_mels, rng, t_init=16):
    g = HifiGANGenerator(num_mels=num_mels, **cfg)
    x0 = np.zeros((1, t_init, num_mels), np.float32)
    params = jax.jit(g.init)(jax.random.PRNGKey(0), x0)
    return g, params


def test_receptive_field_sane():
    r_tiny = receptive_field_frames(TINY_CFG)
    r_full = receptive_field_frames(CSMSC_CFG)
    assert 1 <= r_tiny < 30
    assert r_tiny < r_full < 120  # conservative but not absurd


def test_streaming_equals_monolithic_tiny(rng):
    g, params = _build(TINY_CFG, 8, rng)
    feats = jnp.asarray(rng.normal(size=(2, 57, 8)).astype(np.float32))
    want = np.asarray(jax.jit(g.apply)(params, feats)).reshape(2, -1)
    for chunk in (4, 8, 13):
        sd = StreamingDecoder.from_generator(g, params, TINY_CFG, chunk_frames=chunk)
        got = sd.decode(feats)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)


def test_streaming_csmsc_geometry(rng):
    g, params = _build(CSMSC_CFG, 8, rng)
    r = receptive_field_frames(CSMSC_CFG)
    t = 16 * r + 5  # several chunks, non-divisible tail
    feats = jnp.asarray(rng.normal(size=(1, t, 8)).astype(np.float32))
    want = np.asarray(jax.jit(g.apply)(params, feats)).reshape(1, -1)
    sd = StreamingDecoder.from_generator(g, params, CSMSC_CFG, chunk_frames=4 * r)
    chunks = list(sd.stream(feats))
    assert len(chunks) == -(-t // (4 * r))
    got = np.concatenate(chunks, axis=1)
    np.testing.assert_array_equal(got, want)
    # one compiled graph served every chunk
    assert sd._window_decode_jit._cache_size() == 1


def test_streaming_short_utterance_fallback(rng):
    g, params = _build(TINY_CFG, 8, rng)
    sd = StreamingDecoder.from_generator(g, params, TINY_CFG, chunk_frames=64)
    t = sd.window_frames - 3
    feats = jnp.asarray(rng.normal(size=(1, t, 8)).astype(np.float32))
    want = np.asarray(jax.jit(g.apply)(params, feats)).reshape(1, -1)
    chunks = list(sd.stream(feats))
    assert len(chunks) == 1
    np.testing.assert_array_equal(chunks[0], want)


def test_streaming_chunk_boundaries(rng):
    """Chunk i carries exactly samples [i*S*hop, min(T, (i+1)*S)*hop)."""
    g, params = _build(TINY_CFG, 8, rng)
    sd = StreamingDecoder.from_generator(g, params, TINY_CFG, chunk_frames=5)
    t = sd.window_frames + 13  # several chunks with a ragged tail
    feats = jnp.asarray(rng.normal(size=(1, t, 8)).astype(np.float32))
    sizes = [c.shape[1] for c in sd.stream(feats)]
    hop = sd.hop
    want = [5 * hop] * (t // 5) + ([t % 5 * hop] if t % 5 else [])
    assert sizes == want


def test_streaming_int8_static_scales(rng):
    """The int8 serving decoder with calibrated (static) activation scales
    is per-position deterministic, so streaming it is bit-exact too."""
    from msmctts_tpu.ops.int8_generator import (
        calibrate_act_scales,
        int8_generator_apply,
        quantize_generator_params,
    )

    g, params = _build(TINY_CFG, 8, rng)
    qp = quantize_generator_params(params["params"], TINY_CFG)
    feats = jnp.asarray(rng.normal(size=(1, 61, 8)).astype(np.float32))
    scales = calibrate_act_scales(qp, [feats], TINY_CFG, headroom=1.1)

    def decode_fn(f):
        return int8_generator_apply(qp, f, TINY_CFG, dtype=jnp.float32, act_scales=scales)

    want = np.asarray(decode_fn(feats)).reshape(1, -1)
    sd = StreamingDecoder.from_feature_fn(decode_fn, TINY_CFG, chunk_frames=16)
    got = sd.decode(feats)
    np.testing.assert_array_equal(got, want)
