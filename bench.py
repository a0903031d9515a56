#!/usr/bin/env python
"""Benchmarks on the flagship CSMSC-shaped models. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.

Modes
-----
synth (default)   Jitted text->waveform graph throughput (predictor +
                  MSMC-VQ-GAN synthesis, x300 HiFi-GAN upsampling, 24 kHz).
                  ``vs_baseline`` = value / 300 (driver north star:
                  >=300x real-time per chip, BASELINE.md). Timed by chaining
                  N iterations in-graph (``--method chained``, default) —
                  immune to dispatch pipelining/memoization artifacts.
--train-step      CSMSC-scale VQ-GAN GAN-phase train step (batch 16,
                  D + G + EMA codebook update) -> steps/sec, chained
                  in-graph like synth (state threaded through lax.scan;
                  warmup-phase split printed to stderr). No reference
                  number exists (BASELINE.md: "tracked"); vs_baseline =
                  complete 800k-step CSMSC recipes trainable per day.
--e2e-infer       The SHIPPED two-phase inference path (MSMCTTS.predict:
                  host duration round-trip, frame bucketing, per-bucket
                  compiles) -> x real-time, vs_baseline = value / 300.
--ttfa            Time-to-first-audio, B=1: streaming chunked decode
                  (msmctts_tpu/streaming.py) vs monolithic; emits
                  TTFA_stream in ms, vs_baseline = mono/stream speedup.

--vq-pallas {auto,on,off} routes the quantizer through the fused Pallas VQ
kernel (on TPU) or the unfused XLA path — for kernel a/b measurement.

Weights are randomly initialized: the compute graph, not the audio, is what
is measured. Every timed call uses fresh inputs — the dev-runtime memoizes
executions with identical input buffers (CLAUDE.md).
"""

import argparse
import json
import sys
import time
import traceback

import numpy as np

SAMPLE_RATE = 24000
FRAMESHIFT = 300  # samples per frame (12.5 ms)
AE_YAML = "examples/csmsc/configs/msmc_vq_gan.yaml"
AM_YAML = "examples/csmsc/configs/msmc_vq_gan_am.yaml"


def _emit(metric, value, unit, vs_baseline):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(float(value), 2),
                "unit": unit,
                "vs_baseline": round(float(vs_baseline), 3),
            }
        )
    )


def _vq_pallas_value(flag: str):
    return {"auto": "auto", "on": True, "off": False}[flag]


def _rand_text(rng, B, Lt, n_symbols):
    """Valid ids per embedding stream (CSMSC n_symbols [100, 10, 2];
    out-of-range ids NaN-fill jnp.take on TPU)."""
    cols = [rng.integers(1, max(n, 2), size=(B, Lt)) for n in n_symbols]
    return np.stack(cols, axis=-1).astype(np.int32)


def _ae_module(dtype_unused, vq_pallas, istft=False):
    from msmctts_tpu.config import component_kwargs, load_yaml
    from msmctts_tpu.models.msmc_vqgan import MSMCVQGAN

    yaml_path = AE_YAML.replace(".yaml", "_istft.yaml") if istft else AE_YAML
    node = load_yaml(yaml_path)["task"]["autoencoder"]
    node["quantizer_config"]["use_pallas"] = _vq_pallas_value(vq_pallas)
    return MSMCVQGAN(**component_kwargs(node))


def bench_synth(args):
    import jax
    import jax.numpy as jnp

    from msmctts_tpu.config import component_kwargs, load_yaml
    from msmctts_tpu.models.predictor import MultiStagePredictor
    from msmctts_tpu.parallel.precision import cast_floats

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    if args.istft and args.int8:
        raise NotImplementedError(
            "int8 PTQ kernels cover the HifiGANGenerator decoder only"
        )
    ae = _ae_module(dtype, args.vq_pallas, istft=args.istft)
    am_node = load_yaml(AM_YAML)["task"]["predictor"]
    predictor = MultiStagePredictor(**component_kwargs(am_node))

    B, Lt, T = 16, 128, 512  # 16 utterances x 6.4 s each
    rng = np.random.default_rng(0)
    n_symbols = list(am_node["n_symbols"])
    # init example inputs stay NUMPY: values closed over by a jitted init
    # become trace constants, and a *device-resident* constant forces a D2H
    # fetch mid-trace (this killed the round-2 bench gate through the flaky
    # remote tunnel); host arrays embed for free.
    text_np = _rand_text(rng, B, Lt, n_symbols)
    tl_np = np.full((B,), Lt, np.int32)
    dur_np = np.full((B, Lt), T // Lt, np.float32)
    text = jnp.asarray(text_np)
    text_length = jnp.asarray(tl_np)
    dur = jnp.asarray(dur_np)

    k = jax.random.PRNGKey(0)
    # jitted init: one compiled program instead of per-parameter dispatches
    pvars = jax.jit(
        lambda k: predictor.init(
            {"params": k, "dropout": k}, text_np, tl_np, dur=dur_np,
            max_frames=T, deterministic=True,
        )
    )(k)
    mel_np = np.zeros((2, 16, 80), np.float32)
    mel_len_np = np.asarray([16, 16], np.int32)
    avars = jax.jit(
        lambda k: ae.init(
            {"params": k, "dropout": k}, mel_np, mel_len_np,
            warmup=False, deterministic=True,
        )
    )(k)
    codebooks = [
        avars["codebook"]["quantizer"][f"vq_{i}"]["embed"] for i in range(2)
    ]
    # production inference precision: bf16 activations/params, fp32 VQ
    pvars = dict(pvars, params=cast_floats(pvars["params"], dtype))
    avars = dict(avars, params=cast_floats(avars["params"], dtype))

    i8 = None
    if args.int8:
        from msmctts_tpu.ops.int8_generator import Int8Decoder

        i8 = Int8Decoder(avars["params"]["decoder"], dict(ae.decoder_config),
                         dtype=dtype)

    def synth_wav(pv, av, qp, text, text_length, d, cbs):
        out = predictor.apply(
            pv, text, text_length, dur=d, max_frames=T, codebooks=cbs,
            deterministic=True,
        )
        if i8 is not None:
            from msmctts_tpu.ops.int8_generator import int8_generator_apply

            feats = ae.apply(
                av, out["feat"], out["feat_length"],
                method="synthesis_features", deterministic=True,
            )
            return int8_generator_apply(
                qp, feats, i8.decoder_config, dtype=dtype,
                act_scales=i8.scales,
            )
        return ae.apply(
            av, out["feat"], out["feat_length"], method="synthesis",
            deterministic=True,
        )

    if i8 is not None:
        feats_fn = jax.jit(
            lambda pv, av, t, tl, d, cbs: ae.apply(
                av,
                *(lambda o: (o["feat"], o["feat_length"]))(
                    predictor.apply(pv, t, tl, dur=d, max_frames=T,
                                    codebooks=cbs, deterministic=True)
                ),
                method="synthesis_features", deterministic=True,
            )
        )
        i8.calibrate(feats_fn(pvars, avars, text, text_length, dur, codebooks))

    qp = None if i8 is None else i8.qparams
    tts = jax.jit(synth_wav)

    # warmup / compile
    wav = tts(pvars, avars, qp, text, text_length, dur, codebooks)
    wav.block_until_ready()
    assert wav.shape == (B, T * FRAMESHIFT, 1), wav.shape
    audio_seconds = B * T * FRAMESHIFT / SAMPLE_RATE

    if args.method == "loop":
        # distinct inputs per run so no layer of the stack can cache results
        n_runs = args.runs
        texts = [jnp.asarray(_rand_text(rng, B, Lt, n_symbols)) for _ in range(n_runs)]
        jax.block_until_ready(texts)
        t0 = time.perf_counter()
        for i in range(n_runs):
            wav = tts(pvars, avars, qp, texts[i], text_length, dur, codebooks)
        wav.block_until_ready()
        wall = (time.perf_counter() - t0) / n_runs
    else:
        # Chained: run the synth graph N times inside ONE program via
        # lax.scan, with a data dependency between iterations and a single
        # scalar readout; per-call time is differenced against a length-1
        # chain. Immune to dispatch pipelining and the dev runtime's
        # buffer-identity memoization — the most defensible number this
        # environment can produce (see CLAUDE.md).
        def make_chained(iters):
            @jax.jit
            def chained(pv, av, qp, text, text_length, dur, cbs):
                def body(carry, _):
                    d, acc = carry
                    w = synth_wav(pv, av, qp, text, text_length, d, cbs)
                    s = jnp.sum(w.astype(jnp.float32))
                    return (d + 0.0 * s, acc + s), ()
                (_, acc), _ = jax.lax.scan(
                    body, (dur, jnp.float32(0)), None, length=iters
                )
                return acc
            return chained

        n = max(args.runs, 2)
        c1, cn = make_chained(1), make_chained(n)

        def best_of(fn, trials=3):
            ts = []
            for _ in range(trials):
                t2 = jnp.asarray(_rand_text(rng, B, Lt, n_symbols))
                t2.block_until_ready()
                t0 = time.perf_counter()
                float(fn(pvars, avars, qp, t2, text_length, dur, codebooks))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        best_of(c1, 1), best_of(cn, 1)  # compile + warm
        wall = (best_of(cn) - best_of(c1)) / (n - 1)

    rtf = audio_seconds / wall
    _emit("e2e_tts_throughput", rtf, "x_realtime_per_chip", rtf / 300.0)


def bench_ttfa(args):
    """Time-to-first-audio: streaming chunked HiFi-GAN decode
    (msmctts_tpu/streaming.py) vs the monolithic decode, for ONE
    utterance (B=1 — the interactive-serving latency scenario; the
    reference decodes whole utterances only, msmc_vqgan.py:372-398).

    TTFA_stream = t(AM+features) + t(decode first window)
    TTFA_mono   = t(AM+features) + t(decode all T frames)

    Each stage is timed the chained way (lax.scan + data dependency,
    one scalar readout, differenced against a length-1 chain) — see
    the module docstring for why nothing else is trustworthy here.
    Emits TTFA_stream in ms; vs_baseline = TTFA_mono / TTFA_stream
    (the latency speedup streaming buys over the reference's
    whole-utterance behavior)."""
    import jax
    import jax.numpy as jnp

    from msmctts_tpu.config import component_kwargs, load_yaml
    from msmctts_tpu.models.hifigan import receptive_field_frames
    from msmctts_tpu.models.predictor import MultiStagePredictor
    from msmctts_tpu.parallel.precision import cast_floats

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    ae = _ae_module(dtype, args.vq_pallas)
    am_node = load_yaml(AM_YAML)["task"]["predictor"]
    predictor = MultiStagePredictor(**component_kwargs(am_node))

    B, Lt, T = 1, 128, 512  # one 6.4 s utterance
    chunk = 64  # 0.8 s of audio in the first chunk
    rng = np.random.default_rng(0)
    n_symbols = list(am_node["n_symbols"])
    # numpy init examples: device-resident trace constants force D2H
    # mid-trace through the flaky tunnel (killed the round-2 gate)
    text_np = _rand_text(rng, B, Lt, n_symbols)
    tl_np = np.full((B,), Lt, np.int32)
    dur_np = np.full((B, Lt), T // Lt, np.float32)
    text = jnp.asarray(text_np)
    text_length = jnp.asarray(tl_np)
    dur = jnp.asarray(dur_np)

    k = jax.random.PRNGKey(0)
    pvars = jax.jit(
        lambda k: predictor.init(
            {"params": k, "dropout": k}, text_np, tl_np, dur=dur_np,
            max_frames=T, deterministic=True,
        )
    )(k)
    avars = jax.jit(
        lambda k: ae.init(
            {"params": k, "dropout": k}, np.zeros((2, 16, 80), np.float32),
            np.asarray([16, 16], np.int32), warmup=False, deterministic=True,
        )
    )(k)
    codebooks = [
        avars["codebook"]["quantizer"][f"vq_{i}"]["embed"] for i in range(2)
    ]
    pvars = dict(pvars, params=cast_floats(pvars["params"], dtype))
    avars = dict(avars, params=cast_floats(avars["params"], dtype))

    def features(pv, av, text, tl, d, cbs):
        out = predictor.apply(
            pv, text, tl, dur=d, max_frames=T, codebooks=cbs,
            deterministic=True,
        )
        return ae.apply(
            av, out["feat"], out["feat_length"],
            method="synthesis_features", deterministic=True,
        )

    ctx = receptive_field_frames(dict(ae.decoder_config))
    window = min(T, chunk + 2 * ctx)

    def _dec(mdl, x):
        return mdl.decoder(x)

    def win_decode(av, feats):
        return ae.apply(av, feats[:, :window], method=_dec)

    def full_decode(av, feats):
        return ae.apply(av, feats, method=_dec)

    # one representative features tensor (shape/layout source for trials)
    feats0 = jax.jit(features)(pvars, avars, text, text_length, dur, codebooks)
    feats_np = np.asarray(feats0, np.float32)

    def chained_feats(iters):
        @jax.jit
        def run(pv, av, text, tl, d, cbs):
            def body(carry, _):
                dd, acc = carry
                f = features(pv, av, text, tl, dd, cbs)
                s = jnp.sum(f.astype(jnp.float32))
                return (dd + 0.0 * s, acc + s), ()
            (_, acc), _ = jax.lax.scan(
                body, (d, jnp.float32(0)), None, length=iters
            )
            return acc
        return run

    def chained_decode(decode, iters):
        @jax.jit
        def run(av, feats):
            def body(carry, _):
                f, acc = carry
                w = decode(av, f)
                s = jnp.sum(w.astype(jnp.float32))
                return (f + 0.0 * s, acc + s), ()
            (_, acc), _ = jax.lax.scan(
                body, (feats, jnp.float32(0)), None, length=iters
            )
            return acc
        return run

    n = max(args.runs, 2)

    def stage_time(make, fresh_args, trials=3):
        """(best_of(chain_n) - best_of(chain_1)) / (n - 1); every trial
        gets fresh input buffers (the dev runtime memoizes on buffer
        identity)."""
        c1, cn = make(1), make(n)
        def best(fn):
            ts = []
            for _ in range(trials):
                a = fresh_args()
                jax.block_until_ready(a)
                t0 = time.perf_counter()
                float(fn(*a))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        best(c1), best(cn)  # compile + warm
        return (best(cn) - best(c1)) / (n - 1)

    t_feat = stage_time(
        chained_feats,
        lambda: (pvars, avars, jnp.asarray(_rand_text(rng, B, Lt, n_symbols)),
                 text_length, dur, codebooks),
    )
    def fresh_feats():
        return (avars, jnp.asarray(
            feats_np + rng.normal(scale=1e-3, size=feats_np.shape)
        ).astype(feats0.dtype))

    t_win = stage_time(lambda i: chained_decode(win_decode, i), fresh_feats)
    t_full = stage_time(lambda i: chained_decode(full_decode, i), fresh_feats)

    ttfa_stream = t_feat + t_win
    ttfa_mono = t_feat + t_full
    print(
        f"ttfa: feat={t_feat*1e3:.2f}ms win[{window}f]={t_win*1e3:.2f}ms "
        f"full[{T}f]={t_full*1e3:.2f}ms mono={ttfa_mono*1e3:.2f}ms",
        file=sys.stderr,
    )
    _emit("streaming_ttfa", ttfa_stream * 1e3, "ms_first_audio",
          ttfa_mono / max(ttfa_stream, 1e-9))


def bench_train_step(args):
    import jax

    from msmctts_tpu.config import Config, component_kwargs
    from msmctts_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from msmctts_tpu.registry import get_trainer
    from msmctts_tpu.tasks import build_task

    config = Config(AE_YAML)
    config.task.autoencoder.quantizer_config["use_pallas"] = _vq_pallas_value(
        args.vq_pallas
    )
    if args.fp32:
        config["precision"] = "float32"
    else:
        config["precision"] = "bfloat16"
    task = build_task(config, mode="train")
    mesh = make_mesh()
    trainer = get_trainer("VQGANTrainer")(
        config, task, mesh=mesh, **component_kwargs(config.trainer)
    )

    # CSMSC envelope: batch 16 (msmc_vq_gan.yaml:99-108), ~4.8 s utterances
    B, T = args.batch, args.frames
    n_mels = int(config.task.autoencoder.get("in_dim", 80))
    hop = trainer.frameshift
    rng = np.random.default_rng(0)

    def make_batch():
        return {
            "mel": rng.normal(size=(B, T, n_mels)).astype(np.float32),
            "mel_length": np.full((B,), T, np.int32),
            "wav": (rng.normal(size=(B, T * hop)) * 0.1).astype(np.float32),
            "wav_length": np.full((B,), T * hop, np.int32),
        }

    state = trainer.init_state(jax.random.PRNGKey(0), make_batch())
    state = replicate_state(state, mesh)

    it0 = trainer.warmup_steps + 1  # GAN phase: D + G + EMA codebook update

    if args.method == "loop":
        # compile + warmup
        state, metrics = trainer.train_step(
            state, shard_batch(make_batch(), mesh), it0
        )
        jax.block_until_ready(state)

        batches = [shard_batch(make_batch(), mesh) for _ in range(args.runs)]
        t0 = time.perf_counter()
        for i, b in enumerate(batches):
            state, metrics = trainer.train_step(state, b, it0 + 1 + i)
        jax.block_until_ready(state)
        wall = (time.perf_counter() - t0) / args.runs
        steps_per_sec = 1.0 / wall
        print(
            f"train-step (loop): gan={steps_per_sec:.2f} steps/s",
            file=sys.stderr,
        )
    else:
        # Chained (default): scan N steps in ONE program with the train
        # state threaded as the data dependency between iterations, one
        # scalar readout, differenced against a 1-step chain — the same
        # methodology as the synth bench (the dev runtime memoizes
        # identical-buffer executions and block_until_ready is unreliable
        # on small programs; CLAUDE.md). RNG folds the in-scan step index,
        # so each iteration draws distinct windows/dropout like real
        # training.
        import jax.numpy as jnp

        def make_chained(step_impl, iters, step0):
            @jax.jit
            def chained(state, batch):
                def body(carry, i):
                    st, _ = carry
                    st, vec = step_impl(st, batch, step0 + i)
                    return (st, jnp.sum(vec)), ()
                (st, s), _ = jax.lax.scan(
                    body,
                    (state, jnp.float32(0)),
                    jnp.arange(iters, dtype=jnp.uint32),
                )
                # the metrics sum of the LAST step depends on the whole
                # chain through the carried state
                return s
            return chained

        def phase_time(step_impl, keys, step0):
            n = max(args.runs, 2)
            c1 = make_chained(step_impl, 1, step0)
            cn = make_chained(step_impl, n, step0)

            def best_of(fn, trials=3):
                ts = []
                for _ in range(trials):
                    b = shard_batch(
                        {k: v for k, v in make_batch().items() if k in keys},
                        mesh,
                    )
                    jax.block_until_ready(b)
                    t0 = time.perf_counter()
                    float(fn(state, b))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            best_of(c1, 1), best_of(cn, 1)  # compile + warm
            return (best_of(cn) - best_of(c1)) / (n - 1)

        wall = phase_time(
            trainer._gan_step_impl,
            ("mel", "mel_length", "wav"),
            np.uint32(it0),
        )
        steps_per_sec = 1.0 / wall
        warm_wall = phase_time(
            trainer._warmup_step_impl, ("mel", "mel_length"), np.uint32(1)
        )
        print(
            f"train-step (chained): gan={steps_per_sec:.2f} steps/s "
            f"warmup={1.0 / warm_wall:.2f} steps/s",
            file=sys.stderr,
        )
    # no reference number exists (BASELINE.md: "tracked"); vs_baseline =
    # complete 800k-step CSMSC recipes (msmc_vq_gan.yaml:78) trainable per
    # day at this rate
    _emit(
        "train_step_throughput",
        steps_per_sec,
        "steps_per_sec",
        steps_per_sec * 86400.0 / 800000.0,
    )


def bench_train_profile(args):
    """GAN train-step budget + MFU (VERDICT r4 next #2).

    Times three chained in-graph programs (same methodology as
    --train-step) whose differences isolate the step's cost centers:

      full    the shipped GAN step: AE fwd (vjp) + D update (2B-batched
              fake/real pass) + G losses vs updated D + pullback + both
              optimizer updates + EMA codebooks.
      noadv   the same minus every discriminator: AE fwd + VQ/frame/STFT
              losses + pullback + AE update.
      warmup  the warmup-phase step (no waveform decode, no STFT loss).

    budget:  discriminators   = full - noadv   (MRD+MPD fwd x2 + bwd x2 + D opt)
             decoder+stft     = noadv - warmup (HiFi-GAN fwd+bwd on the
                                12000-sample windows + mel/STFT loss)
             encoder+vq+frame = warmup         (full-utterance FFT encoder,
                                quantizer EMA, frame decoder, fwd+bwd)

    MFU: analytic model FLOPs of the full step from XLA's cost analysis
    (compiled executable), divided by measured wall and the v5e bf16 MXU
    peak (197 TFLOP/s/chip). Writes the full breakdown to
    --profile-out (default train_profile.json) and emits the usual ONE
    JSON line (metric train_step_mfu_pct).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from msmctts_tpu.config import Config, component_kwargs
    from msmctts_tpu.data.wire import decode_batch
    from msmctts_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from msmctts_tpu.registry import get_trainer
    from msmctts_tpu.tasks import build_task

    config = Config(AE_YAML)
    config.task.autoencoder.quantizer_config["use_pallas"] = _vq_pallas_value(
        args.vq_pallas
    )
    config["precision"] = "float32" if args.fp32 else "bfloat16"
    task = build_task(config, mode="train")
    mesh = make_mesh()
    tr = get_trainer("VQGANTrainer")(
        config, task, mesh=mesh, **component_kwargs(config.trainer)
    )

    B, T = args.batch, args.frames
    n_mels = int(config.task.autoencoder.get("in_dim", 80))
    hop = tr.frameshift
    rng = np.random.default_rng(0)

    def make_batch():
        return {
            "mel": rng.normal(size=(B, T, n_mels)).astype(np.float32),
            "mel_length": np.full((B,), T, np.int32),
            "wav": (rng.normal(size=(B, T * hop)) * 0.1).astype(np.float32),
        }

    state = tr.init_state(jax.random.PRNGKey(0), make_batch())
    state = replicate_state(state, mesh)
    it0 = tr.warmup_steps + 1

    def noadv_impl(state, batch, step):
        """tr._gan_step_impl minus every discriminator term (bench-only
        decomposition twin; windows/dropout RNG identical)."""
        b = decode_batch(batch)
        rng_ = jax.random.fold_in(jax.random.PRNGKey(tr.seed), step)
        mel, mel_length, wav = b["mel"], b["mel_length"], b["wav"]
        r_win, r_drop = jax.random.split(rng_)
        maxval = jnp.maximum(mel_length.astype(jnp.int32) - tr.frame_lengths, 1)
        starts = jax.random.randint(r_win, (mel.shape[0],), 0, maxval)
        target = jax.vmap(
            lambda w, s: jax.lax.dynamic_slice(
                w, (s * tr.frameshift,), (tr.sample_lengths,)
            )
        )(wav, starts)
        bs = state.get("model_state", {}).get("batch_stats") or None

        def fwd(params):
            return tr._ae_diffable(
                params, state["codebook"], mel, mel_length, r_drop, False,
                starts, batch_stats=bs,
            )

        diffable, ae_vjp, aux = jax.vjp(fwd, state["params"]["autoencoder"], has_aux=True)

        def g_loss_fn(dif):
            g, _ = tr._base_g_loss(dif, aux, mel, mel_length)
            g = g + tr.lambda_stft * sum(tr._stft_loss(dif["fake"], target).values())
            return g

        g, ct = jax.value_and_grad(g_loss_fn)(diffable)
        (ae_grads,) = ae_vjp(ct)
        upd, new_opt = tr.ae_tx.update(
            ae_grads, state["opt_state"]["autoencoder"], state["params"]["autoencoder"]
        )
        new_state = dict(
            state,
            params=dict(state["params"], autoencoder=optax.apply_updates(
                state["params"]["autoencoder"], upd)),
            codebook=aux["codebook"],
            model_state={"batch_stats": aux["batch_stats"]},
            opt_state=dict(state["opt_state"], autoencoder=new_opt),
        )
        return new_state, jnp.reshape(g, (1,))

    def make_chained(step_impl, iters, step0):
        @jax.jit
        def chained(state, batch):
            def body(carry, i):
                st, _ = carry
                st, vec = step_impl(st, batch, step0 + i)
                return (st, jnp.sum(vec)), ()

            (st, s), _ = jax.lax.scan(
                body, (state, jnp.float32(0)), jnp.arange(iters, dtype=jnp.uint32)
            )
            return s

        return chained

    def phase_time(step_impl, keys, step0):
        n = max(args.runs, 2)
        c1 = make_chained(step_impl, 1, step0)
        cn = make_chained(step_impl, n, step0)

        def best_of(fn, trials=3):
            ts = []
            for _ in range(trials):
                b = shard_batch(
                    {k: v for k, v in make_batch().items() if k in keys}, mesh
                )
                jax.block_until_ready(b)
                t0 = time.perf_counter()
                float(fn(state, b))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        best_of(c1, 1), best_of(cn, 1)  # compile + warm
        return (best_of(cn) - best_of(c1)) / (n - 1)

    gan_keys = ("mel", "mel_length", "wav")
    t_full = phase_time(tr._gan_step_impl, gan_keys, np.uint32(it0))
    t_noadv = phase_time(noadv_impl, gan_keys, np.uint32(it0))
    t_warm = phase_time(tr._warmup_step_impl, ("mel", "mel_length"), np.uint32(1))

    # analytic model FLOPs of ONE full step from the compiled executable
    flops = None
    try:
        b = shard_batch({k: v for k, v in make_batch().items() if k in gan_keys}, mesh)
        comp = (
            jax.jit(tr._gan_step_impl)
            .lower(state, b, np.uint32(it0))
            .compile()
        )
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    peak = 197e12  # v5e bf16 MXU peak per chip
    mfu = (flops / t_full / peak * 100.0) if flops else None
    budget = {
        "precision": "float32" if args.fp32 else "bfloat16",
        "batch": B,
        "frames": T,
        "window_samples": tr.sample_lengths,
        "steps_per_sec": {
            "full_gan": round(1.0 / t_full, 2),
            "no_discriminators": round(1.0 / t_noadv, 2),
            "warmup_phase": round(1.0 / t_warm, 2),
        },
        "step_ms": {
            "full_gan": round(t_full * 1e3, 1),
            "discriminators (full - noadv)": round((t_full - t_noadv) * 1e3, 1),
            "decoder+stft (noadv - warmup)": round((t_noadv - t_warm) * 1e3, 1),
            "encoder+vq+frame (warmup)": round(t_warm * 1e3, 1),
        },
        "model_flops_per_step": flops,
        "model_tflops_per_sec": round(flops / t_full / 1e12, 1) if flops else None,
        "mfu_pct_vs_v5e_bf16_peak": round(mfu, 1) if mfu else None,
        "method": "chained in-graph scan, differenced vs 1-step chain",
    }
    print(json.dumps(budget, indent=2), file=sys.stderr)
    with open(args.profile_out, "w") as f:
        json.dump(budget, f, indent=2)
    _emit(
        "train_step_mfu_pct",
        mfu if mfu else 0.0,
        "pct_of_v5e_bf16_peak",
        (1.0 / t_full) * 86400.0 / 800000.0,
    )


def bench_e2e_infer(args):
    import jax

    from msmctts_tpu.config import Config, component_kwargs, load_yaml
    from msmctts_tpu.models.predictor import MultiStagePredictor
    from msmctts_tpu.tasks import build_task

    # Task built from the AM recipe; the frozen AE is attached directly
    # (random weights) instead of via _checkpoint.
    config = Config(AM_YAML)
    task = build_task(config, mode="infer")
    predictor = task.networks["predictor"]
    ae = _ae_module(None, args.vq_pallas)

    B, Lt = args.batch, 128
    rng = np.random.default_rng(0)
    n_symbols = list(config.task["predictor"]["n_symbols"])
    # numpy init examples: device constants in a trace force mid-trace D2H
    text_np = _rand_text(rng, B, Lt, n_symbols)
    tl_np = np.full((B,), Lt, np.int32)
    dur_np = np.full((B, Lt), 4.0, np.float32)
    k = jax.random.PRNGKey(0)
    pvars = jax.jit(
        lambda k: predictor.init(
            {"params": k, "dropout": k}, text_np, tl_np,
            dur=dur_np, max_frames=512,
            deterministic=True,
        )
    )(k)
    mel_np = np.zeros((2, 16, 80), np.float32)
    mel_len_np = np.asarray([16, 16], np.int32)
    avars = jax.jit(
        lambda k: ae.init(
            {"params": k, "dropout": k}, mel_np, mel_len_np,
            warmup=False, deterministic=True,
        )
    )(k)
    # random weights predict ~0 durations; bias the duration head to ~4
    # frames/phone so the benched path carries a realistic frame load
    pparams = MultiStagePredictor.bias_durations(
        jax.device_get(pvars)["params"], 4.0
    )

    task.networks["autoencoder"] = ae
    task.load_variables(
        {
            "params": {"predictor": pparams, "autoencoder": avars["params"]},
            "codebook": avars["codebook"],
        }
    )
    task._loaded_modules = True

    if args.static_frames is not None:
        task.static_max_frames = args.static_frames
    if args.int8:
        task.int8_decoder = True

    def make_batch():
        return {
            "text": _rand_text(rng, B, Lt, n_symbols),
            "text_length": np.full((B,), Lt, np.int64),
        }

    # warmup: compile both phases for this bucket
    out = task.predict(make_batch())
    t0 = time.perf_counter()
    total_audio = 0.0
    for _ in range(args.runs):
        out = task.predict(make_batch())
        total_audio += sum(len(w) for w in out["wav"]) / SAMPLE_RATE
    wall = time.perf_counter() - t0
    rtf = total_audio / wall
    _emit("e2e_infer_throughput", rtf, "x_realtime_per_chip", rtf / 300.0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fp32", action="store_true",
                        help="benchmark in float32 instead of bfloat16")
    parser.add_argument("--train-step", action="store_true",
                        help="benchmark the CSMSC-scale GAN train step")
    parser.add_argument("--train-profile", action="store_true",
                        help="GAN train-step budget split (discriminators / "
                        "decoder+stft / encoder) + analytic MFU; writes "
                        "--profile-out JSON")
    parser.add_argument("--profile-out", default="train_profile.json",
                        help="--train-profile artifact path")
    parser.add_argument("--e2e-infer", action="store_true",
                        help="benchmark the shipped two-phase inference path")
    parser.add_argument("--ttfa", action="store_true",
                        help="time-to-first-audio: streaming chunked decode "
                        "vs monolithic, B=1 (serving latency scenario)")
    parser.add_argument("--vq-pallas", choices=["auto", "on", "off"],
                        default="auto", help="fused Pallas VQ kernel routing")
    parser.add_argument("--int8", action="store_true",
                        help="serve the HiFi-GAN decoder in int8 (PTQ + "
                        "calibrated static activation scales) — synth and "
                        "--e2e-infer modes")
    parser.add_argument("--istft", action="store_true",
                        help="synth mode: swap the decoder for the "
                        "ISTFTGenerator fast decoder (msmc_vq_gan_istft.yaml; "
                        "same x300 ratio, MXU-dense spectral tail)")
    parser.add_argument("--static-frames", type=int, default=None,
                        help="--e2e-infer: fixed frame bucket, single "
                        "device round-trip per call (tasks.py latency mode)")
    parser.add_argument("--method", choices=["chained", "loop"],
                        default="chained",
                        help="synth/--train-step timing: 'chained' runs N "
                        "iterations in-graph (lax.scan + data dependency, "
                        "one scalar readout, differenced vs a 1-iteration "
                        "chain); 'loop' is the legacy per-dispatch loop")
    parser.add_argument("--runs", type=int, default=8)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--frames", type=int, default=384,
                        help="mel frames per utterance (--train-step/"
                        "--train-profile). NOTE: the production feed "
                        "buckets full utterances up to FRAME_BUCKETS' "
                        "2432 (datasets.py); the default 384 approximates "
                        "the synthetic-corpus mix, and the GAN step's "
                        "window crop makes D+decoder cost bucket-"
                        "independent, so only the encoder/VQ share "
                        "(~5% of the step) scales with this choice. The "
                        "observed production GAN rate (~4.5 steps/s) "
                        "corroborates the T=384 chained number (4.10)")
    args = parser.parse_args()
    from msmctts_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    if args.train_profile:
        fn, metric, unit = bench_train_profile, "train_step_mfu_pct", "pct_of_v5e_bf16_peak"
    elif args.train_step:
        fn, metric, unit = bench_train_step, "train_step_throughput", "steps_per_sec"
    elif args.ttfa:
        fn, metric, unit = bench_ttfa, "streaming_ttfa", "ms_first_audio"
    elif args.e2e_infer:
        fn, metric, unit = bench_e2e_infer, "e2e_infer_throughput", "x_realtime_per_chip"
    else:
        fn, metric, unit = bench_synth, "e2e_tts_throughput", "x_realtime_per_chip"

    # The driver parses stdout blind: ALWAYS end with one JSON line. Remote
    # TPU backends throw transient FailedPrecondition/Unavailable errors
    # (the round-2 gate died on one mid-trace) — retry the whole mode once
    # before reporting the failure as a parseable error object.
    last_err = None
    for attempt in range(2):
        try:
            fn(args)
            return
        except Exception as e:  # noqa: BLE001 — anything must yield JSON
            last_err = e
            traceback.print_exc(file=sys.stderr)
            if attempt == 0:
                print(
                    f"bench: attempt {attempt + 1} failed "
                    f"({type(e).__name__}); retrying",
                    file=sys.stderr,
                )
                time.sleep(10.0)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": None,
                "unit": unit,
                "vs_baseline": None,
                "error": f"{type(last_err).__name__}: {last_err}",
            }
        )
    )
    sys.exit(1)


if __name__ == "__main__":
    main()
