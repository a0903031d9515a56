"""StableHLO deployment artifacts for the TTS graph (``jax.export``).

The reference framework can only be deployed by shipping its Python model
code + a torch checkpoint (/root/reference/infer.py). Here the full
text->waveform program — duration prediction, length regulation, the
multi-stage cascade with codebook snapping, and the HiFi-GAN decode — is
exported as ONE serialized StableHLO module with the trained weights
embedded as constants: a single self-contained file a serving runtime can
execute with no model code, no YAML, and no retrace risk. Artifacts are
lowered for BOTH cpu and tpu by default.

Shapes are static (the same (batch, text-bucket, frame-bucket) discipline
as the serving engine, msmctts_tpu/serving.py): export one module per
shape the deployment will use.

  fn(text[B,Lt,S] int32, text_length[B] int32) ->
      (wav[B, max_frames*hop] f32, wav_length[B] i32, mel_length[B] i32)

Weight-norm folding, precision casting (config ``precision:``), and the
fp32 VQ codebooks all happen before export, so the artifact is exactly the
production graph.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

MANIFEST = "manifest.json"


def build_tts_fn(task, max_frames: int, int8: bool = False):
    """The pure text->waveform function of an infer-mode ``MSMCTTS`` task
    with variables loaded, weights closed over (they become artifact
    constants). Mirrors ``MSMCTTS.predict`` in single-round-trip
    (``static_max_frames``) mode: durations predicted in-graph, frame
    bucket fixed at ``max_frames``. With ``int8``, the HiFi-GAN decode
    uses the task's CALIBRATED PTQ decoder (``task._int8()`` — run one
    int8 inference first so the static activation scales exist); the
    quantized weights and scales freeze into the artifact."""
    import jax.numpy as jnp

    from msmctts_tpu.tasks import extract_codebooks

    predictor = task.networks["predictor"]
    ae = task.networks["autoencoder"]
    pvars = task.variables["predictor"]
    avars = task.variables["autoencoder"]
    from msmctts_tpu.models.hifigan import generator_upsample_ratio

    codebooks = [jnp.asarray(c) for c in extract_codebooks(avars)]
    hop = generator_upsample_ratio(ae.decoder_config)
    i8 = None
    if int8:
        i8 = task._int8()
        if i8.scales is None:
            raise ValueError(
                "int8 export needs calibrated activation scales: run one "
                "inference with task.int8_decoder=True first"
            )

    def fn(text, text_length):
        dur = predictor.apply(
            pvars, text, text_length, method="predict_durations"
        )
        dur = jnp.round(jnp.maximum(dur, 0.0))
        mask = jnp.arange(dur.shape[1])[None, :] < text_length[:, None]
        dur = dur * mask
        total = jnp.sum(dur, axis=1).astype(jnp.int32)
        out = predictor.apply(
            pvars, text, text_length, dur=dur, max_frames=max_frames,
            codebooks=codebooks, deterministic=True,
        )
        if i8 is not None:
            from msmctts_tpu.ops.int8_generator import int8_generator_apply

            feats = ae.apply(
                avars, out["feat"], out["feat_length"],
                method="synthesis_features", deterministic=True,
            )
            wav = int8_generator_apply(
                i8.qparams, feats, i8.decoder_config, dtype=i8.dtype,
                act_scales=i8.scales,
            )[..., 0]
        else:
            wav = ae.apply(
                avars, out["feat"], out["feat_length"], method="synthesis",
                deterministic=True,
            )[..., 0]
        mel_length = jnp.minimum(total, max_frames)
        # frames here are the FINE-stage frames; one frame = `hop` samples
        # only after the x(frameshift/fine-scale) expansion inside
        # synthesis — recover the true ratio from the traced shapes.
        ratio = wav.shape[1] // out["feat"][-1].shape[1]
        return (
            wav.astype(jnp.float32),
            (mel_length * ratio).astype(jnp.int32),
            mel_length,
        )

    return fn, hop


def export_tts(
    task,
    batch_size: int,
    text_length: int,
    max_frames: int,
    platforms: Sequence[str] = ("cpu", "tpu"),
    int8: bool = False,
):
    """Export one (B, Lt, F) TTS module. Returns ``jax.export.Exported``."""
    import jax
    from jax import export as jexport

    n_symbols = task.networks["predictor"].n_symbols
    n_streams = len(n_symbols) if isinstance(n_symbols, (list, tuple)) else 1
    fn, _ = build_tts_fn(task, max_frames, int8=int8)
    args = (
        jax.ShapeDtypeStruct((batch_size, text_length, n_streams), np.int32),
        jax.ShapeDtypeStruct((batch_size,), np.int32),
    )
    return jexport.export(jax.jit(fn), platforms=list(platforms))(*args)


def save_artifacts(
    task,
    out_dir: str,
    batch_size: int,
    text_lengths: Sequence[int],
    max_frames: int,
    sample_rate: int,
    platforms: Sequence[str] = ("cpu", "tpu"),
    int8: bool = False,
) -> dict:
    """Export one module per text bucket and write them plus a manifest."""
    os.makedirs(out_dir, exist_ok=True)
    _, hop = build_tts_fn(task, max_frames, int8=int8)
    modules = {}
    for lt in sorted(set(int(l) for l in text_lengths)):
        exp = export_tts(task, batch_size, lt, max_frames, platforms, int8=int8)
        name = f"tts_b{batch_size}_l{lt}_f{max_frames}.shlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        modules[str(lt)] = name
    n_symbols = task.networks["predictor"].n_symbols
    manifest = {
        "kind": "msmctts-tpu stablehlo tts",
        "batch_size": batch_size,
        "max_frames": max_frames,
        "hop": hop,
        "sample_rate": int(sample_rate),
        "n_streams": len(n_symbols)
        if isinstance(n_symbols, (list, tuple))
        else 1,
        "platforms": list(platforms),
        "int8": bool(int8),
        "modules": modules,
        "io": "fn(text[B,Lt,S] i32, text_length[B] i32) -> "
              "(wav[B, max_frames*ratio] f32, wav_length[B] i32, "
              "mel_length[B] i32)",
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedTTS:
    """Serve synthesis from a ``save_artifacts`` directory — no model
    code, config, or checkpoint needed; modules deserialize lazily per
    text bucket.

    Duck-types the slice of the ``MSMCTTS`` infer surface the serving
    engine uses (``infer_step``/``n_streams``), so ``BatchingEngine`` — and
    ``serve.py --artifact`` — run straight off the artifact. Batch size
    and text buckets are fixed by the export; streaming requires the task
    path (chunked decode is not part of the exported monolith)."""

    def __init__(self, art_dir: str):
        with open(os.path.join(art_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        self.dir = art_dir
        self.batch_size = int(self.manifest["batch_size"])
        self.sample_rate = int(self.manifest["sample_rate"])
        self.n_streams = int(self.manifest.get("n_streams", 1))
        self.buckets = sorted(int(k) for k in self.manifest["modules"])
        self._loaded = {}

    def _module(self, lt: int):
        mod = self._loaded.get(lt)
        if mod is None:
            from jax import export as jexport

            name = self.manifest["modules"][str(lt)]
            with open(os.path.join(self.dir, name), "rb") as f:
                mod = jexport.deserialize(bytearray(f.read()))
            self._loaded[lt] = mod
        return mod

    def synthesize(self, text: np.ndarray, text_length: np.ndarray):
        """Padded batch in, per-utterance trimmed float32 wavs out."""
        lt = int(text.shape[1])
        if lt not in self.buckets:
            raise ValueError(f"no exported module for text length {lt}; "
                             f"have {self.buckets}")
        wav, wav_length, _ = self._module(lt).call(
            np.asarray(text, np.int32), np.asarray(text_length, np.int32)
        )
        wav, wav_length = np.asarray(wav), np.asarray(wav_length)
        return [w[:n] for w, n in zip(wav, wav_length)]

    # ---- BatchingEngine task surface (msmctts_tpu/serving.py) ----
    def infer_step(self, batch: dict) -> dict:
        return {"wav": self.synthesize(batch["text"], batch["text_length"])}

    def predict_stream(self, batch: dict, chunk_frames: int = 64):
        raise NotImplementedError(
            "streaming needs the task path (serve.py -m <checkpoint>); "
            "exported modules are monolithic"
        )
