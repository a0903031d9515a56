"""Int8 QAT (ops/qat_int8.py): the fake-quant STE twin must sit on the
EXACT serving quantization grid, gradients must flow through it, the
weight-norm write-back must be lossless, and a brief fine-tune must reduce
the true int8 serving error — the property the tool exists for."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from msmctts_tpu.models.hifigan import HifiGANGenerator
from msmctts_tpu.ops.int8_generator import Int8Decoder, int8_generator_apply
from msmctts_tpu.ops.qat_int8 import (
    fake_quant_weight,
    fold_decoder_params,
    qat_generator_apply,
    unfold_to_weight_norm,
)

CFG = dict(
    upsample_rates=[2, 2],
    upsample_kernel_sizes=[4, 4],
    upsample_initial_channel=64,
    resblock_kernel_sizes=[3, 7],
    resblock_dilation_sizes=[[1, 3], [1, 3]],
)


def _init(rng, num_mels=16, T=24):
    g = HifiGANGenerator(num_mels=num_mels, **CFG)
    x = jnp.asarray(rng.normal(size=(2, T, num_mels)).astype(np.float32))
    v = g.init(jax.random.PRNGKey(0), x)
    return g, v, x


def _calibrated(params, x, smooth_alpha=1.0):
    i8 = Int8Decoder(params, CFG, dtype=jnp.float32, smooth_alpha=smooth_alpha)
    i8.calibrate(x)
    return i8


def test_fake_quant_matches_serving_int8(rng):
    """qat_generator_apply on the folded params reproduces the true int8
    serving path (same scales, same SmoothQuant fold): both sit on the
    same quantization grid, differing only by fp32-vs-int32 accumulation."""
    from tools.qat_int8 import extract_smooth

    g, v, x = _init(rng)
    i8 = _calibrated(v["params"], x)
    want = np.asarray(i8.apply(x), np.float32)

    folded = fold_decoder_params(v["params"], CFG)
    smooth = extract_smooth(i8.qparams)
    got = np.asarray(
        qat_generator_apply(folded, x, CFG, act_scales=i8.scales, smooth=smooth),
        np.float32,
    )
    assert got.shape == want.shape
    rel = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-12)
    assert rel < 2e-3, rel


def test_fake_quant_weight_grid(rng):
    """fake_quant_weight lands every value on the per-output-channel int8
    grid (values are integer multiples of amax/127, |code| <= 127)."""
    w = jnp.asarray(rng.normal(size=(3, 8, 12)).astype(np.float32))
    fq = np.asarray(fake_quant_weight(w))
    scale = np.max(np.abs(np.asarray(w)), axis=(0, 1)) / 127.0
    codes = fq / scale[None, None, :]
    np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)
    assert np.max(np.abs(codes)) <= 127.001


def test_ste_gradients_flow(rng):
    """The STE makes the fake-quant graph differentiable: a scalar loss has
    finite, non-zero gradients for every folded kernel and bias."""
    g, v, x = _init(rng)
    i8 = _calibrated(v["params"], x)
    from tools.qat_int8 import extract_smooth

    folded = jax.tree_util.tree_map(jnp.asarray, fold_decoder_params(v["params"], CFG))
    smooth = extract_smooth(i8.qparams)

    def loss(fp):
        y = qat_generator_apply(fp, x, CFG, act_scales=i8.scales, smooth=smooth)
        return jnp.mean(jnp.square(y))

    grads = jax.grad(loss)(folded)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    nonzero = sum(float(np.abs(np.asarray(l)).sum()) > 0 for l in leaves)
    assert nonzero >= len(leaves) - 2  # conv_pre bias may be exactly unused


def test_unfold_weight_norm_roundtrip(rng):
    """fold -> unfold -> fold reproduces every kernel and bias exactly: the
    QAT'd checkpoint decodes the QAT'd weights, not an approximation."""
    g, v, x = _init(rng)
    folded = fold_decoder_params(v["params"], CFG)
    params2 = unfold_to_weight_norm(folded, dict(v["params"]), CFG)
    refolded = fold_decoder_params(params2, CFG)
    for site in folded:
        np.testing.assert_allclose(
            np.asarray(refolded[site]["w"]), np.asarray(folded[site]["w"]),
            rtol=1e-6, atol=1e-7,
        )
    # and the flax module itself produces the same waveform
    w1 = np.asarray(g.apply({"params": v["params"]}, x))
    w2 = np.asarray(g.apply({"params": params2}, x))
    np.testing.assert_allclose(w2, w1, atol=1e-5)


def test_qat_reduces_true_int8_error(rng):
    """The end-to-end property: a brief STE fine-tune against the float
    decoder's output — with the periodic calibration refresh the tool uses
    (training against a STALE grid measurably regresses the re-calibrated
    error) — reduces the TRUE serving int8 path's error on the same inputs
    (re-folded, re-quantized, re-calibrated from the written-back
    weight-norm params: the exact tool flow)."""
    from msmctts_tpu.ops.qat_int8 import calibrate_from_folded

    g, v, x = _init(rng)
    target = g.apply({"params": v["params"]}, x)  # float distillation target

    i8 = _calibrated(v["params"], x)
    base = np.asarray(i8.apply(x), np.float32)
    err0 = np.linalg.norm(base - np.asarray(target)) / np.linalg.norm(target)

    folded = jax.tree_util.tree_map(jnp.asarray, fold_decoder_params(v["params"], CFG))
    scales, smooth = calibrate_from_folded(jax.device_get(folded), x, CFG)
    tx = optax.adam(1e-4)
    opt = tx.init(folded)

    @jax.jit
    def step(folded, opt, scales, smooth):
        def loss(fp):
            y = qat_generator_apply(fp, x, CFG, act_scales=scales, smooth=smooth)
            return jnp.mean(jnp.square(y - target))

        l, grads = jax.value_and_grad(loss)(folded)
        updates, opt = tx.update(grads, opt, folded)
        return optax.apply_updates(folded, updates), opt, l

    for i in range(1, 101):
        folded, opt, l = step(folded, opt, scales, smooth)
        if i % 25 == 0:  # grid refresh: weights moved, so must the scales
            scales, smooth = calibrate_from_folded(jax.device_get(folded), x, CFG)

    params_qat = unfold_to_weight_norm(jax.device_get(folded), dict(v["params"]), CFG)
    i8_qat = _calibrated(params_qat, x)
    got = np.asarray(i8_qat.apply(x), np.float32)
    err1 = np.linalg.norm(got - np.asarray(target)) / np.linalg.norm(target)
    assert err1 < err0 * 0.75, (err0, err1)
