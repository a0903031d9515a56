"""FFT blocks / length regulator / duration predictor tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from msmctts_tpu.models.transformer import (
    DurationPredictor,
    FFTBlocks,
    LengthRegulator,
    regulate_lengths,
    sinusoid_position_table,
)
from msmctts_tpu.ops.masking import positions_from_lengths, sequence_mask


def test_sinusoid_table_matches_reference_formula():
    """Reference transformer.py:388-407."""
    n_pos, d = 20, 8
    table = sinusoid_position_table(n_pos, d)
    golden = np.array(
        [
            [pos / np.power(10000, 2 * (j // 2) / d) for j in range(d)]
            for pos in range(n_pos)
        ]
    )
    golden[:, 0::2] = np.sin(golden[:, 0::2])
    golden[:, 1::2] = np.cos(golden[:, 1::2])
    golden[0] = 0.0  # padding row
    np.testing.assert_allclose(table, golden, rtol=1e-5, atol=1e-6)


def test_regulate_lengths_matches_repeat_interleave(rng):
    """The cumsum/gather expansion must equal torch.repeat_interleave
    (reference transformer.py:460-478)."""
    B, L, D = 3, 5, 4
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    durations = rng.integers(0, 4, size=(B, L)).astype(np.float32)
    max_out = 32
    out, out_lengths, pos = regulate_lengths(jnp.asarray(x), jnp.asarray(durations), max_out)

    for b in range(B):
        expanded = torch.repeat_interleave(
            torch.from_numpy(x[b]), torch.from_numpy(durations[b]).long(), dim=0
        ).numpy()
        n = expanded.shape[0]
        assert int(out_lengths[b]) == n
        np.testing.assert_allclose(np.asarray(out)[b, :n], expanded, rtol=1e-6)
        # padding region zeroed
        np.testing.assert_allclose(np.asarray(out)[b, n:], 0.0)
        # positions 1-based then 0 at padding
        np.testing.assert_array_equal(
            np.asarray(pos)[b], [(i + 1) if i < n else 0 for i in range(max_out)]
        )


def test_regulate_lengths_alpha(rng):
    x = rng.normal(size=(1, 4, 2)).astype(np.float32)
    durations = np.array([[2, 2, 2, 2]], np.float32)
    out, out_lengths, _ = regulate_lengths(jnp.asarray(x), jnp.asarray(durations), 32, alpha=2.0)
    assert int(out_lengths[0]) == 16


def test_fft_blocks_masking(rng):
    """Padding positions must produce exactly zero outputs."""
    B, T, D = 2, 12, 16
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    lengths = jnp.asarray(np.array([12, 7], np.int32))
    pos = positions_from_lengths(lengths, T)
    m = FFTBlocks(
        max_seq_len=32, n_layers=2, n_head=2, d_k=8, d_v=8, d_model=D, d_inner=32
    )
    variables = m.init(jax.random.PRNGKey(0), x, pos)
    out, non_pad = m.apply(variables, x, pos, deterministic=True)
    np.testing.assert_allclose(np.asarray(out)[1, 7:], 0.0, atol=1e-7)
    assert not np.allclose(np.asarray(out)[1, :7], 0.0)


def test_fft_blocks_padding_invariance(rng):
    """Outputs on valid frames must not depend on padded content."""
    B, T, D = 1, 10, 16
    x_np = rng.normal(size=(B, T, D)).astype(np.float32)
    lengths = jnp.asarray(np.array([6], np.int32))
    pos = positions_from_lengths(lengths, T)
    m = FFTBlocks(
        max_seq_len=32, n_layers=2, n_head=2, d_k=8, d_v=8, d_model=D, d_inner=32
    )
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x_np), pos)
    out1, _ = m.apply(variables, jnp.asarray(x_np), pos, deterministic=True)
    x2 = x_np.copy()
    x2[:, 6:] = 99.0  # garbage in padding
    out2, _ = m.apply(variables, jnp.asarray(x2), pos, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out1)[:, :6], np.asarray(out2)[:, :6], rtol=1e-4, atol=1e-5
    )


def test_duration_predictor_shapes(rng):
    B, T, D = 2, 8, 16
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    non_pad = sequence_mask(jnp.asarray([8, 5]), T, dtype=jnp.float32)[..., None]
    m = DurationPredictor(filter_size=8)
    variables = m.init(jax.random.PRNGKey(0), x, non_pad)
    out = m.apply(variables, x, non_pad, deterministic=True)
    assert out.shape == (B, T)
    np.testing.assert_allclose(np.asarray(out)[1, 5:], 0.0, atol=1e-7)


def test_length_regulator_train_vs_infer(rng):
    B, T, D = 2, 6, 16
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    non_pad = sequence_mask(jnp.asarray([6, 4]), T, dtype=jnp.float32)[..., None]
    target = jnp.asarray(np.array([[2, 1, 3, 2, 1, 1], [1, 2, 2, 1, 0, 0]], np.float32))
    m = LengthRegulator(input_size=D, duration_predictor_filter_size=8)
    variables = m.init(
        jax.random.PRNGKey(0), x, non_pad, max_out_len=16, target=target
    )
    out, out_len, pos, dur = m.apply(
        variables, x, non_pad, max_out_len=16, target=target, deterministic=False
    , rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.shape == (B, 16, D)
    np.testing.assert_array_equal(np.asarray(out_len), [10, 6])
    assert dur.shape == (B, T)  # raw predictions during training

    # inference without target: rounded predictions
    out, out_len, pos, dur = m.apply(
        variables, x, non_pad, max_out_len=16, deterministic=True
    )
    assert dur.dtype == jnp.int32
