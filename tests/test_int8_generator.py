"""Int8 serving-path generator: exact tap/phase decomposition of the conv
ops, and end-to-end closeness of the PTQ generator vs the fp32 flax one on
the SAME trained params pytree."""

import jax
import jax.numpy as jnp
import numpy as np

from msmctts_tpu.models.hifigan import HifiGANGenerator
from msmctts_tpu.ops.int8_generator import (
    int8_conv1d,
    int8_conv_transpose1d,
    int8_generator_apply,
    quantize_generator_params,
)

CFG = dict(
    upsample_rates=[2, 2],
    upsample_kernel_sizes=[4, 4],
    upsample_initial_channel=64,
    resblock_kernel_sizes=[3, 7],
    resblock_dilation_sizes=[[1, 3], [1, 3]],
)


def _ref_conv1d(x_f, w_f, padding, dilation=1):
    return jax.lax.conv_general_dilated(
        x_f, w_f, window_strides=(1,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
    )


def _ref_conv_transpose1d(x_f, w_f, stride, padding):
    k = w_f.shape[0]
    return jax.lax.conv_general_dilated(
        x_f, jnp.flip(w_f, axis=0), window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


def test_int8_conv1d_exact(rng):
    """int32 tap accumulation is bit-exact vs the float conv on the same
    integer operands (k/dilation grid covers the generator's conv geometry)."""
    B, T, Cin, Cout = 2, 37, 8, 12
    for k, d in [(3, 1), (3, 5), (7, 3), (11, 1)]:
        xq = rng.integers(-127, 128, size=(B, T, Cin)).astype(np.int8)
        wq = rng.integers(-127, 128, size=(k, Cin, Cout)).astype(np.int8)
        got = int8_conv1d(jnp.asarray(xq), jnp.asarray(wq), (k - 1) // 2 * d, d)
        want = _ref_conv1d(
            jnp.asarray(xq, jnp.float32), jnp.asarray(wq, jnp.float32),
            (k - 1) // 2 * d, d,
        )
        assert got.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want).astype(np.int64))


def test_int8_conv_transpose1d_exact(rng):
    """Phase decomposition matches torch-semantics transposed conv exactly,
    for every (k, u) pair used by the shipped recipes."""
    B, T, Cin, Cout = 2, 19, 6, 10
    for k, u in [(12, 6), (11, 5), (4, 2), (6, 2)]:
        p = (k - u) // 2
        xq = rng.integers(-127, 128, size=(B, T, Cin)).astype(np.int8)
        wq = rng.integers(-127, 128, size=(k, Cin, Cout)).astype(np.int8)
        got = int8_conv_transpose1d(jnp.asarray(xq), jnp.asarray(wq), u, p)
        want = _ref_conv_transpose1d(
            jnp.asarray(xq, jnp.float32), jnp.asarray(wq, jnp.float32), u, p
        )
        assert got.shape == (B, T * u, Cout)
        assert want.shape == (B, T * u, Cout)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want).astype(np.int64))


def test_int8_generator_close(rng):
    """PTQ generator tracks the fp32 one on the same trained params: the
    only error source is int8 rounding (per-tensor act, per-channel weight),
    bounded here as relative L2 over the waveform."""
    g = HifiGANGenerator(num_mels=16, **CFG)
    x = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32))
    v = g.init(jax.random.PRNGKey(0), x)
    want = np.asarray(g.apply(v, x), np.float32)

    qp = quantize_generator_params(v["params"], CFG)
    got = np.asarray(
        int8_generator_apply(qp, x, CFG, dtype=jnp.float32), np.float32
    )
    assert got.shape == want.shape
    rel = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-12)
    assert rel < 0.05, rel
    # int8 kernels really are int8
    assert qp["conv_pre"]["w_q"].dtype == np.int8
    assert qp["up_0"]["w_q"].dtype == np.int8


def test_int8_static_scales_match_dynamic(rng):
    """Calibrated static scales track the dynamic-quant output when
    calibrated on the same input. Not bit-equal: the static scale is
    frozen through a float64 division (python float), so individual codes
    can shift by one quantization step — bounded here as relative L2."""
    from msmctts_tpu.ops.int8_generator import calibrate_act_scales

    g = HifiGANGenerator(num_mels=16, **CFG)
    x = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32))
    v = g.init(jax.random.PRNGKey(0), x)
    qp = quantize_generator_params(v["params"], CFG)

    dyn = np.asarray(int8_generator_apply(qp, x, CFG, dtype=jnp.float32))
    scales = calibrate_act_scales(qp, [x], CFG, headroom=1.0)
    assert len(scales) > 0 and all(s > 0 for s in scales.values())
    stat = np.asarray(
        int8_generator_apply(qp, x, CFG, dtype=jnp.float32, act_scales=scales)
    )
    rel = np.linalg.norm(stat - dyn) / (np.linalg.norm(dyn) + 1e-12)
    assert rel < 0.05, rel


def test_int8_task_analysis_synthesis(tmp_path, rng):
    """Task-level wiring: MSMCTTS.analysis_synthesis with int8_decoder=True
    calibrates on the first batch and produces waveforms tracking the float
    path (infer.py --int8)."""
    from msmctts_tpu.tasks import build_task
    from tests.tiny import tiny_ae_config, write_tiny_dataset

    corpus = str(tmp_path)
    write_tiny_dataset(corpus)
    config = tiny_ae_config(corpus)
    task = build_task(config, mode="infer")
    ae = task.networks["autoencoder"]

    mel = rng.normal(size=(2, 16, 8)).astype(np.float32)
    mel_length = np.asarray([16, 12], np.int32)
    v = jax.jit(
        lambda k: ae.init(
            {"params": k, "dropout": k}, np.zeros((2, 16, 8), np.float32),
            np.asarray([16, 16], np.int32), warmup=False, deterministic=True,
        )
    )(jax.random.PRNGKey(0))
    task.load_variables(
        {"params": {"autoencoder": v["params"]}, "codebook": v["codebook"]}
    )

    batch = {"mel": mel, "mel_length": mel_length}
    out_f = task.analysis_synthesis(batch)
    task.int8_decoder = True
    out_8 = task.analysis_synthesis(batch)

    assert task._jit_cache.get("int8") is not None
    assert task._jit_cache["int8"].scales  # first-batch calibration ran
    for wf, w8 in zip(out_f["wav"], out_8["wav"]):
        assert wf.shape == w8.shape
        assert np.all(np.isfinite(w8))
        rel = np.linalg.norm(w8.astype(np.float32) - wf.astype(np.float32)) / (
            np.linalg.norm(wf) + 1e-12
        )
        assert rel < 0.25, rel


def test_smoothquant_ones_fold_is_identity(rng):
    """A SmoothQuant fold of all-ones vectors must be bit-identical to no
    fold (the s_in divide and the kernel multiply are both exact no-ops),
    proving the fold plumbing changes nothing but rounding geometry."""
    from msmctts_tpu.ops.int8_generator import _fold_generator_params

    g = HifiGANGenerator(num_mels=16, **CFG)
    x = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32))
    v = g.init(jax.random.PRNGKey(0), x)
    folded = _fold_generator_params(v["params"], CFG)
    ones = {
        site: np.ones(w.shape[-2], np.float32)
        for site, (w, _) in folded.items()
        if site != "conv_post"
    }
    qp_plain = quantize_generator_params(v["params"], CFG)
    qp_ones = quantize_generator_params(v["params"], CFG, smooth=ones)
    out_plain = np.asarray(int8_generator_apply(qp_plain, x, CFG, dtype=jnp.float32))
    out_ones = np.asarray(int8_generator_apply(qp_ones, x, CFG, dtype=jnp.float32))
    np.testing.assert_array_equal(out_plain, out_ones)


def test_smoothquant_beats_plain_on_skewed_channels(rng):
    """The fold's whole point: when activation ranges are skewed across
    channels (4 decades here), per-tensor activation rounding destroys the
    quiet channels; migrating the ranges into the per-channel-quantized
    weights recovers them. Asserts the calibrated Int8Decoder with the
    fold (default alpha=1) lands strictly closer to the float generator
    than without it."""
    from msmctts_tpu.ops.int8_generator import Int8Decoder

    g = HifiGANGenerator(num_mels=16, **CFG)
    skew = np.logspace(-2, 2, 16).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32) * skew)
    v = g.init(jax.random.PRNGKey(0), x)
    want = np.asarray(g.apply(v, x), np.float32)

    rels = {}
    for alpha in (None, 1.0):
        dec = Int8Decoder(
            v["params"], CFG, headroom=1.0, dtype=jnp.float32,
            smooth_alpha=alpha,
        )
        dec.calibrate(x)
        got = np.asarray(dec.apply(x), np.float32)
        rels[alpha] = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-12)
    assert rels[1.0] < rels[None], rels
    assert rels[1.0] < 0.05, rels


def test_int8_decoder_smooth_calibration_state(rng):
    """After calibrate(): every quantized site carries its s_in vector
    (sized to the kernel's input channels), static scales cover the same
    sites, and re-calibration on different data stays self-consistent
    (observation always runs against the UNsmoothed base qparams)."""
    from msmctts_tpu.ops.int8_generator import Int8Decoder

    g = HifiGANGenerator(num_mels=16, **CFG)
    x = jnp.asarray(rng.normal(size=(1, 16, 16)).astype(np.float32))
    v = g.init(jax.random.PRNGKey(2), x)
    dec = Int8Decoder(v["params"], CFG, dtype=jnp.float32)
    dec.calibrate(x)
    sites = set(dec.scales)
    assert "conv_pre" in sites and "up_0" in sites
    assert "conv_post" not in sites

    def check(qp, prefix=""):
        for name, node in qp.items():
            if name == "conv_post":
                assert "s_in" not in node
            elif "w_q" in node:
                assert node["s_in"].shape == (node["w_q"].shape[-2],), name
                assert np.all(node["s_in"] > 0)
            else:  # resblock subtree
                check(node, prefix + name + "/")

    check(dec.qparams)

    first = {k: float(s) for k, s in dec.scales.items()}
    first_sin = np.array(dec.qparams["conv_pre"]["s_in"])
    dec.calibrate(x * 3.0)
    # same shape stats, scaled input -> scales move, s_in stays finite
    assert set(dec.scales) == set(first)
    assert dec.scales["conv_pre"] > first["conv_pre"]
    assert np.all(np.isfinite(dec.qparams["conv_pre"]["s_in"]))
    assert first_sin.shape == dec.qparams["conv_pre"]["s_in"].shape


def test_int8_quantize_scales_per_channel(rng):
    g = HifiGANGenerator(num_mels=16, **CFG)
    x = jnp.asarray(rng.normal(size=(1, 8, 16)).astype(np.float32))
    v = g.init(jax.random.PRNGKey(1), x)
    qp = quantize_generator_params(v["params"], CFG)
    node = qp["conv_pre"]
    assert node["scale"].shape == (node["w_q"].shape[-1],)
    # scale reconstructs the folded kernel to within one quantization step
    w_deq = node["w_q"].astype(np.float32) * node["scale"]
    assert np.all(np.abs(w_deq) <= 127.0 * node["scale"] + 1e-6)


def test_int8_float_sites_hybrid(rng):
    """Mixed-precision fallback: float_sites prefixes keep their folded
    FLOAT kernels (no w_q), apply still runs, and the fallback sites are
    numerically exact vs the flax generator (the all-float extreme equals
    the fp32 generator up to fold rounding)."""
    from msmctts_tpu.ops.int8_generator import Int8Decoder

    g = HifiGANGenerator(num_mels=16, **CFG)
    x = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32))
    v = g.init(jax.random.PRNGKey(0), x)
    want = np.asarray(g.apply(v, x), np.float32)

    # stage-0 fallback: up_0 + its resblocks stay float
    qp = quantize_generator_params(
        v["params"], CFG, float_sites=("up_0", "resblock_0_")
    )
    assert "w" in qp["up_0"] and "w_q" not in qp["up_0"]
    assert "w" in qp["resblock_0_0"]["conv1_0"]
    assert qp["up_1"]["w_q"].dtype == np.int8  # stage 1 still int8
    got = np.asarray(
        int8_generator_apply(qp, x, CFG, dtype=jnp.float32), np.float32
    )
    rel_hybrid = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-12)
    assert rel_hybrid < 0.05, rel_hybrid

    # all-float extreme: every site float => equals the flax generator
    # (weight-norm fold is the only difference, ~1e-6)
    qp_all = quantize_generator_params(
        v["params"], CFG, float_sites=("conv_pre", "up_", "resblock_")
    )
    got_all = np.asarray(
        int8_generator_apply(qp_all, x, CFG, dtype=jnp.float32), np.float32
    )
    rel_all = np.linalg.norm(got_all - want) / (np.linalg.norm(want) + 1e-12)
    assert rel_all < 1e-4, rel_all

    # Int8Decoder path: calibration only produces scales for QUANTIZED
    # sites, and apply works end-to-end with SmoothQuant + fallback
    dec = Int8Decoder(
        v["params"], CFG, dtype=jnp.float32,
        float_sites=("up_0", "resblock_0_"),
    )
    dec.calibrate(x)
    assert not any(s.startswith(("up_0", "resblock_0_")) for s in dec.scales)
    y = np.asarray(dec.apply(x), np.float32)
    rel_dec = np.linalg.norm(y - want) / (np.linalg.norm(want) + 1e-12)
    assert rel_dec < 0.05, rel_dec
