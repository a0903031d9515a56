"""QS-TTS trainers: EmbVQGANTrainer (synthesizer) and NASynEmbFSTrainer
(predictor over SSL embeddings).

Reconstructed from the reference spec (trainers/emb_vqgan_trainer.py:15-253
— broken at reference HEAD: dead ``voicemaker`` imports and an unset
``stft_loss_supervised_step`` attribute that raises at line 123; SURVEY.md
2.5). Reconstruction decisions:
  * ``stft_loss_supervised_step`` is a real config knob (default 0) gating
    the GAN terms, mirroring ``frame_loss_supervised_step`` which gates
    waveform decoding.
  * sub-batch windows: ``sample_batch_size`` sequences are drawn without
    replacement, then one window per drawn sequence — on-device via
    ``jax.random.permutation`` (emb_vqgan_trainer.py:40-56).
  * adversarial prosody estimator (GRL-style): the estimator minimizes
    pitch/energy MSE on stop-gradient content representations x0.01; the
    generator *maximizes* the same loss x0.01 (emb_vqgan_trainer.py:96-120).

Same TPU structure as VQGANTrainer: single AE forward via jax.vjp, D (and
prosody-D) updated before the generator cotangent is pulled back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from msmctts_tpu.data.wire import decode_batch
from msmctts_tpu.parallel.precision import cast_floats
from msmctts_tpu.registry import register_trainer
from msmctts_tpu.tasks import load_frozen_autoencoder
from msmctts_tpu.training.base_trainer import BaseTrainer
from msmctts_tpu.training.losses import (
    duration_loss,
    feature_matching_loss,
    frame_loss,
    lsgan_d_loss,
    lsgan_g_loss,
    paired_disc_apply,
    quantizer_loss,
)
from msmctts_tpu.training.optim import build_optimizer, optimizer_config_for
from msmctts_tpu.training.vqgan_trainer import VQGANTrainer


@register_trainer("EmbVQGANTrainer")
class EmbVQGANTrainer(VQGANTrainer):
    def __init__(
        self,
        config,
        task,
        mesh=None,
        sample_batch_size: int = -1,
        frame_loss_supervised_step: int = 0,
        stft_loss_supervised_step: int = 0,
        **kwargs,
    ):
        kwargs.setdefault("warmup_steps", frame_loss_supervised_step)
        super().__init__(config, task, mesh=mesh, **kwargs)
        self.sample_batch_size = sample_batch_size
        self.frame_loss_supervised_step = frame_loss_supervised_step
        self.stft_loss_supervised_step = stft_loss_supervised_step
        self.prosody = task.networks.get("prosody_estimator")
        if self.prosody is not None:
            self.pr_tx = build_optimizer(
                optimizer_config_for(config, "prosody_estimator"),
                config.get("lr_scheduler"),
                None,
            )

    # ----------------------------------------------------------------- state
    def init_state(self, rng, batch):
        arrays = {
            k: jnp.asarray(batch[k])
            for k in ("emb", "emb_length", "pitch", "energy", "mel")
            if k in batch
        }

        @jax.jit
        def _init(rng, b):
            r_ae, r_d, r_pr, r_drop = jax.random.split(rng, 4)
            emb, emb_length = b["emb"], b["emb_length"]
            init_kwargs = dict(decode=True, deterministic=False)
            if self.frame_lengths > 0:
                init_kwargs.update(
                    window_starts=jnp.zeros((emb.shape[0],), jnp.int32),
                    window_frames=self.frame_lengths,
                )
            ae_vars = self.ae.init(
                {"params": r_ae, "dropout": r_drop},
                emb,
                emb_length,
                pitch=b.get("pitch"),
                energy=b.get("energy"),
                mel=b.get("mel"),
                **init_kwargs,
            )
            wav_win = jnp.zeros(
                (emb.shape[0], max(self.sample_lengths, self.frameshift)),
                jnp.float32,
            )
            d_vars = self.disc.init(r_d, wav_win)
            state = {
                "params": {
                    "autoencoder": ae_vars["params"],
                    "discriminator": d_vars["params"],
                },
                "codebook": ae_vars.get("codebook", {}),
                "model_state": {"batch_stats": ae_vars.get("batch_stats", {})},
                "opt_state": {
                    "autoencoder": self.ae_tx.init(ae_vars["params"]),
                    "discriminator": self.d_tx.init(d_vars["params"]),
                },
            }
            if self.prosody is not None:
                pvars = self.prosody.init(
                    r_pr,
                    jnp.zeros((emb.shape[0], emb.shape[1], self.ae.n_model_size)),
                    emb_length,
                )
                state["params"]["prosody_estimator"] = pvars["params"]
                state["opt_state"]["prosody_estimator"] = self.pr_tx.init(
                    pvars["params"]
                )
            return state

        return _init(rng, arrays)

    # ------------------------------------------------------------ AE forward
    def _ae_diffable_emb(self, params, state, inputs, rng, decode, win_idx, win_starts):
        kwargs = dict(decode=decode, deterministic=False)
        if decode and win_starts is not None:
            kwargs.update(
                window_indices=win_idx,
                window_starts=win_starts,
                window_frames=self.frame_lengths,
            )
        params = cast_floats(params, self.compute_dtype)
        inputs = {
            k: (cast_floats(v, self.compute_dtype) if k != "emb_length" else v)
            for k, v in inputs.items()
        }
        variables = {"params": params, "codebook": state["codebook"]}
        bs = state.get("model_state", {}).get("batch_stats", {})
        mutable = ["codebook"]
        if bs:
            variables["batch_stats"] = bs
            mutable.append("batch_stats")
        out, mut = self.ae.apply(
            variables,
            inputs["emb"],
            inputs["emb_length"],
            pitch=inputs.get("pitch"),
            energy=inputs.get("energy"),
            mel=inputs.get("mel"),
            mutable=mutable,
            rngs={"dropout": rng},
            **kwargs,
        )
        diffable = {"encoder_diffs": out["encoder_diffs"]}
        if "mel_outputs" in out:
            diffable["mel_outputs"] = out["mel_outputs"]
        if out.get("decoder_diffs") is not None:
            diffable["prior_loss"] = out["decoder_diffs"]["total_loss"]
        if out.get("content_representations") is not None:
            diffable["content"] = out["content_representations"]
        if decode:
            diffable["fake"] = out["decoder_outputs"][..., 0]
        aux = {
            "codebook": mut.get("codebook", state["codebook"]),
            "batch_stats": mut.get("batch_stats", bs),
            "encoder_lengths": [
                jax.lax.stop_gradient(l) for l in out["encoder_lengths"]
            ],
            "prior_metrics": jax.lax.stop_gradient(
                {
                    k: v
                    for k, v in (out.get("decoder_diffs") or {}).items()
                    if k != "total_loss"
                }
            ),
        }
        return diffable, aux

    def _emb_step_impl(self, state, batch, step, decode, gan):
        """One jitted step; ``decode``/``gan`` are static phase flags."""
        batch = decode_batch(batch)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), step)
        inputs = {
            k: batch[k]
            for k in ("emb", "emb_length", "pitch", "energy", "mel")
            if k in batch
        }
        mel = batch["mel"]
        mel_length = batch["emb_length"]
        B = mel.shape[0]
        r_win, r_sel, r_drop = jax.random.split(rng, 3)

        win_idx = win_starts = target = None
        if decode:
            n_win = self.sample_batch_size if self.sample_batch_size > 0 else B
            if self.sample_batch_size > 0:
                perm = jax.random.permutation(r_sel, B)[:n_win]
                win_idx = jnp.sort(perm)
            else:
                win_idx = jnp.arange(B)
            sel_len = mel_length[win_idx]
            maxval = jnp.maximum(sel_len.astype(jnp.int32) - self.frame_lengths, 1)
            win_starts = jax.random.randint(r_win, (n_win,), 0, maxval)
            wav_sel = batch["wav"][win_idx]
            target = jax.vmap(
                lambda w, s: jax.lax.dynamic_slice(
                    w, (s * self.frameshift,), (self.sample_lengths,)
                )
            )(wav_sel, win_starts)

        def fwd(params):
            return self._ae_diffable_emb(
                params, state, inputs, r_drop, decode, win_idx, win_starts
            )

        diffable, ae_vjp, aux = jax.vjp(fwd, state["params"]["autoencoder"], has_aux=True)

        new_params = dict(state["params"])
        new_opt = dict(state["opt_state"])
        metrics = {}

        # --- prosody estimator D step ---
        prosody_target = None
        if self.prosody is not None and "content" in diffable:
            prosody_target = jnp.concatenate(
                [inputs["pitch"], inputs["energy"]], axis=-1
            )

            def pr_loss_fn(pp, content):
                _, pred = self.prosody.apply(
                    {"params": pp}, content, mel_length, deterministic=True
                )
                return frame_loss(pred, prosody_target, mel_length)

            pr_loss, pr_grads = jax.value_and_grad(pr_loss_fn)(
                state["params"]["prosody_estimator"],
                jax.lax.stop_gradient(diffable["content"]),
            )
            metrics["d_prosody_loss"] = pr_loss
            upd, new_pr_opt = self.pr_tx.update(
                jax.tree_util.tree_map(lambda g: g * 0.01, pr_grads),
                state["opt_state"]["prosody_estimator"],
                state["params"]["prosody_estimator"],
            )
            new_params["prosody_estimator"] = optax.apply_updates(
                state["params"]["prosody_estimator"], upd
            )
            new_opt["prosody_estimator"] = new_pr_opt

        # --- discriminator step ---
        new_d_params = state["params"]["discriminator"]
        if gan:
            fake = diffable["fake"]

            def d_loss_fn(pd):
                pd = cast_floats(pd, self.compute_dtype)
                fs, _, rs, _ = paired_disc_apply(
                    self.disc, pd, jax.lax.stop_gradient(fake),
                    cast_floats(target, self.compute_dtype),
                )
                real_l, fake_l = lsgan_d_loss(rs, fs)
                return real_l + fake_l, (real_l, fake_l)

            (d_loss, (d_real, d_fake)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state["params"]["discriminator"])
            d_upd, new_d_opt = self.d_tx.update(
                d_grads, state["opt_state"]["discriminator"],
                state["params"]["discriminator"],
            )
            new_d_params = optax.apply_updates(
                state["params"]["discriminator"], d_upd
            )
            new_opt["discriminator"] = new_d_opt
            metrics.update(d_loss=d_loss, d_loss_real=d_real, d_loss_fake=d_fake)
        new_params["discriminator"] = new_d_params

        # --- generator loss vs updated discriminators ---
        def g_loss_fn(dif):
            m = {}
            prior = (
                {"total_loss": dif["prior_loss"]} if "prior_loss" in dif else None
            )
            g = jnp.zeros((), jnp.float32)
            if dif.get("encoder_diffs"):
                vq, vq_m = quantizer_loss(
                    dif["encoder_diffs"], aux["encoder_lengths"], prior,
                    lambda_vq=self.lambda_vq, lambda_pr=self.lambda_pr,
                )
                m.update(vq_m)
                g = g + vq
            if "mel_outputs" in dif:
                fl = frame_loss(dif["mel_outputs"], mel, mel_length)
                m["frame_loss"] = fl
                g = g + self.lambda_frame * fl
            if decode:
                stft_terms = self._stft_loss(dif["fake"], target)
                stft_sum = sum(stft_terms.values())
                m.update(stft_terms)
                m["stft_loss"] = stft_sum
                g = g + self.lambda_stft * stft_sum
            if self.prosody is not None and "content" in dif:
                _, pred = self.prosody.apply(
                    {"params": new_params["prosody_estimator"]},
                    dif["content"],
                    mel_length,
                    deterministic=True,
                )
                pl = frame_loss(pred, prosody_target, mel_length)
                m["g_prosody_loss"] = pl
                g = g - 0.01 * pl  # generator maximizes estimator error
            if gan:
                pd = cast_floats(new_d_params, self.compute_dtype)
                fs, ff, _, rf = paired_disc_apply(
                    self.disc, pd, dif["fake"],
                    cast_floats(target, self.compute_dtype),
                )
                adv = lsgan_g_loss(fs)
                fm = feature_matching_loss(ff, rf)
                lam = (
                    jax.lax.stop_gradient(g / jnp.maximum(fm, 1e-12))
                    if self.lambda_fm == "auto"
                    else self.lambda_fm
                )
                g = g + adv + fm * lam
                m["fm_loss"] = fm
                m["adv_loss"] = adv
            m["g_loss"] = g
            return g, m

        (g_total, g_metrics), out_ct = jax.value_and_grad(g_loss_fn, has_aux=True)(
            diffable
        )
        (ae_grads,) = ae_vjp(out_ct)
        ae_upd, new_ae_opt = self.ae_tx.update(
            ae_grads, state["opt_state"]["autoencoder"],
            state["params"]["autoencoder"],
        )
        new_params["autoencoder"] = optax.apply_updates(
            state["params"]["autoencoder"], ae_upd
        )
        new_opt["autoencoder"] = new_ae_opt

        metrics.update(g_metrics)
        metrics.update(aux["prior_metrics"])
        new_state = {
            "params": new_params,
            "codebook": aux["codebook"],
            "model_state": {"batch_stats": aux["batch_stats"]},
            "opt_state": new_opt,
        }
        return new_state, self._pack_metrics(f"emb_{decode}_{gan}", metrics)

    def train_step(self, state, batch, iteration):
        import numpy as np
        decode = iteration > self.frame_loss_supervised_step
        gan = decode and iteration > self.stft_loss_supervised_step
        key = (decode, gan)
        if not hasattr(self, "_emb_steps"):
            self._emb_steps = {}
        if key not in self._emb_steps:
            self._emb_steps[key] = jax.jit(
                lambda s, b, r, d=decode, g=gan: self._emb_step_impl(s, b, r, d, g),
                donate_argnums=(0,),
            )
        keep = ("emb", "emb_length", "pitch", "energy", "mel", "wav")
        batch = {k: batch[k] for k in keep if k in batch}
        state, vec = self._emb_steps[key](state, batch, np.uint32(iteration))
        return state, self._unpack_metrics(f"emb_{decode}_{gan}", vec)

    def evaluate(self, batch, logger, iteration):
        """Emb-family analysis-synthesis of the first batch utterance.

        Overrides VQGANTrainer.evaluate, whose mel/mel_length signature
        does not exist in the EmbDataset batch (emb/pitch/energy inputs,
        emb_length): full-utterance forward, waveform + predicted-mel
        heatmap to tensorboard."""
        import numpy as np

        if logger.writer is None:
            return
        if self._eval_fn is None:
            def _eval(params, codebook, batch_stats, emb, emb_length,
                      pitch, energy, mel):
                variables = {"params": params, "codebook": codebook}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                out = self.ae.apply(
                    variables, emb, emb_length,
                    pitch=pitch, energy=energy, mel=mel,
                    deterministic=True,
                )
                return out["decoder_outputs"], out.get("mel_outputs")
            self._eval_fn = jax.jit(_eval)

        from msmctts_tpu.parallel.mesh import host_local_rows

        emb = jnp.asarray(host_local_rows(batch["emb"], 1))
        length = jnp.asarray(host_local_rows(batch["emb_length"], 1))
        pitch = jnp.asarray(host_local_rows(batch["pitch"], 1))
        energy = jnp.asarray(host_local_rows(batch["energy"], 1))
        mel = jnp.asarray(host_local_rows(batch["mel"], 1))
        wav, pred_mel = self._eval_fn(
            self.state["params"]["autoencoder"], self.state["codebook"],
            self.state.get("model_state", {}).get("batch_stats", {}),
            emb, length, pitch, energy, mel,
        )
        wav = np.asarray(wav)[0, : int(length[0]) * (wav.shape[1] // emb.shape[1]), 0]
        payload = {"audio": {"eval/wav": (wav, self.samplerate)}}
        if pred_mel is not None:
            m = np.asarray(pred_mel)[0, : int(length[0])].T  # [D, T]
            m = (m - m.min()) / max(m.max() - m.min(), 1e-6)
            payload["image"] = {"eval/pred_mel": m[..., None]}
        logger.log(iteration, payload)


@register_trainer("NASynEmbFSTrainer")
class NASynEmbFSTrainer(BaseTrainer):
    """QS-TTS predictor trainer (emb_vqgan_trainer.py:177-253): same shape
    as PredictorTrainer but teacher analysis consumes emb+pitch/energy."""

    def __init__(
        self,
        config,
        task,
        mesh=None,
        grad_clip_thresh: float = 1.0,
        eval_inteval_iters: int = 1000,
        training_methods=("mse",),
        loss_weights=(1.0,),
        lambda_dur: float = 1.0,
    ):
        super().__init__(config, task, mesh)
        self.training_methods = list(training_methods)
        self.loss_weights = [
            list(w) if isinstance(w, (list, tuple)) else w for w in loss_weights
        ]
        self.lambda_dur = lambda_dur
        self.predictor = task.networks["predictor"]
        # frozen teacher loads lazily (reference msmctts_trainer.py:288-295)
        self.ae = None
        self.ae_variables = None
        self.tx = build_optimizer(
            optimizer_config_for(config, "predictor"),
            config.get("lr_scheduler"),
            grad_clip_thresh,
            freeze_patterns=config.get("freeze"),
        )
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))

    def _ensure_autoencoder(self):
        if self.ae is not None:
            return
        node = self.config.task["autoencoder"]
        self.ae, self.ae_variables, _ = load_frozen_autoencoder(
            node["_checkpoint"], node.get("_config")
        )

    def _analysis(self, batch):
        return self.ae.apply(
            self.ae_variables,
            batch["emb"],
            batch["emb_length"],
            pitch=batch.get("pitch"),
            energy=batch.get("energy"),
            method="analysis",
            deterministic=True,
        )

    def init_state(self, rng, batch):
        self._ensure_autoencoder()
        arrays = {k: jnp.asarray(v) for k, v in batch.items() if k != "_id"}

        @jax.jit
        def _init(rng, b):
            r_p, r_drop = jax.random.split(rng)
            q = self._analysis(b)
            pvars = self.predictor.init(
                {"params": r_p, "dropout": r_drop},
                b["text"],
                b["text_length"],
                dur=b["dur"],
                feat=q["quantizer_outputs"],
                feat_length=q["quantizer_lengths"],
                deterministic=False,
            )
            return {
                "params": {"predictor": pvars["params"]},
                "opt_state": {"predictor": self.tx.init(pvars["params"])},
            }

        return _init(rng, arrays)

    def _step_impl(self, state, batch, step):
        batch = decode_batch(batch)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), step)
        q = jax.lax.stop_gradient(self._analysis(batch))

        def loss_fn(params):
            out = self.predictor.apply(
                {"params": params},
                batch["text"],
                batch["text_length"],
                dur=batch["dur"],
                feat=q["quantizer_outputs"],
                feat_length=q["quantizer_lengths"],
                deterministic=False,
                rngs={"dropout": rng},
            )
            emb_loss = self.ae.apply(
                self.ae_variables,
                out["feat"],
                out["feat_length"],
                q,
                methods=self.training_methods,
                loss_weights=self.loss_weights,
                method="compute_embedding_loss",
            )
            metrics = {k: v for k, v in emb_loss.items() if k != "total_loss"}
            total = emb_loss["total_loss"]
            dl = (
                duration_loss(out["duration"], batch["dur"], batch["text_length"])
                * self.lambda_dur
            )
            metrics["duration_loss"] = dl
            total = total + dl
            metrics["total_loss"] = total
            return total, metrics

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]["predictor"]
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        upd, new_opt = self.tx.update(
            grads, state["opt_state"]["predictor"], state["params"]["predictor"]
        )
        new_params = optax.apply_updates(state["params"]["predictor"], upd)
        return (
            {"params": {"predictor": new_params}, "opt_state": {"predictor": new_opt}},
            self._pack_metrics("step", metrics),
        )

    def train_step(self, state, batch, iteration):
        import numpy as np
        keep = ("emb", "emb_length", "pitch", "energy", "text", "text_length", "dur")
        batch = {k: batch[k] for k in keep if k in batch}
        state, vec = self._step(state, batch, np.uint32(iteration))
        return state, self._unpack_metrics("step", vec)
