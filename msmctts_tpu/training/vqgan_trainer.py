"""MSMC-VQ-GAN trainer: the full GAN step as one jitted pure function.

Reference semantics (trainers/msmctts_trainer.py:74-219) reproduced:

  * warmup phase (iteration <= warmup_steps): autoencoder forward without
    waveform decode; loss = lambda_vq * commitment + lambda_pr * prior +
    lambda_frame * masked mel MSE.
  * GAN phase: per-utterance random windows (sample_lengths samples); loss
    adds lambda_stft * (MelLoss | MR-STFT), LSGAN adversarial and
    feature-matching terms. The discriminator is updated FIRST on
    (stop_gradient(fake), real), then the generator loss is evaluated
    against the *updated* discriminator (msmctts_trainer.py:162-183),
    including re-running D on real for feature matching.
  * ``lambda_fm='auto'`` scales FM to the current generator-loss magnitude
    (msmctts_trainer.py:194-196).

TPU-first structure: the autoencoder forward runs ONCE per step via
``jax.vjp`` — the discriminator update consumes its (stop-gradient) fake
output, then the generator cotangent is pulled back through the saved
forward residuals. EMA codebook updates happen inside the same forward
(mutable 'codebook' collection) as *global* masked sums: under a sharded
batch XLA all-reduces them over the mesh, so multi-chip codebooks never
drift (fixes reference distributed.py:160-163, SURVEY.md 2.9).

One boundary difference from the reference: at iteration == warmup_steps
the reference decodes a waveform it never uses (loss has no GAN terms,
msmctts_trainer.py:121-148); here that step runs the warmup graph instead.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from msmctts_tpu.data.wire import decode_batch
from msmctts_tpu.parallel.precision import cast_floats, compute_dtype
from msmctts_tpu.registry import register_trainer
from msmctts_tpu.training.base_trainer import BaseTrainer
from msmctts_tpu.training.losses import (
    feature_matching_loss,
    frame_loss,
    lsgan_d_loss,
    lsgan_g_loss,
    mel_loss,
    multi_resolution_stft_loss,
    paired_disc_apply,
    quantizer_loss,
)
from msmctts_tpu.training.optim import build_optimizer, optimizer_config_for


@register_trainer("VQGANTrainer")
class VQGANTrainer(BaseTrainer):
    def __init__(
        self,
        config,
        task,
        mesh=None,
        warmup_steps: int = 0,
        lambda_frame: float = 1.0,
        eval_inteval_iters: int = 1000,  # reference spelling kept for YAML parity
        grad_clip_thresh: float = 1.0,
        sample_lengths: int = 24000,
        lambda_vq: float = 1.0,
        lambda_pr: float = 1.0,
        lambda_fm=2.0,
        lambda_stft: float = 45.0,
        stft_loss_func: str = "mel_loss",
        stft_loss_config: Optional[dict] = None,
    ):
        super().__init__(config, task, mesh)
        self.warmup_steps = int(warmup_steps)
        self.lambda_frame = lambda_frame
        self.lambda_vq = lambda_vq
        self.lambda_pr = lambda_pr
        self.lambda_fm = lambda_fm
        self.lambda_stft = lambda_stft
        self.grad_clip_thresh = grad_clip_thresh
        ds = config.dataset
        self.frameshift = ds["frameshift"][list(ds["feature"]).index("mel")]
        self.sample_lengths = sample_lengths
        self.frame_lengths = (
            -1 if sample_lengths == -1 else sample_lengths // self.frameshift
        )
        self.stft_loss_func = stft_loss_func
        self.stft_loss_config = dict(stft_loss_config or {})
        self.samplerate = ds["samplerate"]

        self.compute_dtype = compute_dtype(config)
        self.ae = task.networks["autoencoder"]
        self.disc = task.networks["discriminator"]
        lr_cfg = config.get("lr_scheduler")
        freeze = config.get("freeze")
        self.ae_tx = build_optimizer(
            optimizer_config_for(config, "autoencoder"), lr_cfg, grad_clip_thresh,
            freeze_patterns=freeze,
        )
        self.d_tx = build_optimizer(
            optimizer_config_for(config, "discriminator"), lr_cfg, None
        )
        self.eval_interval = int(eval_inteval_iters or 0)
        self._warmup_step = jax.jit(self._warmup_step_impl, donate_argnums=(0,))
        self._gan_step = jax.jit(self._gan_step_impl, donate_argnums=(0,))
        self._eval_fn = None

    # ----------------------------------------------------------------- state
    def init_state(self, rng, batch):
        mel = jnp.asarray(batch["mel"])
        mel_length = jnp.asarray(batch["mel_length"])

        # One jitted program for the whole init: eager flax init dispatches
        # one tiny XLA computation per parameter, which is ruinously slow.
        @jax.jit
        def _init(rng, mel, mel_length):
            r_ae, r_d, r_drop = jax.random.split(rng, 3)
            # init the FULL graph (warmup=True would skip the waveform
            # decoder and leave its params uncreated); a minimal window
            # keeps it cheap.
            init_kwargs = dict(warmup=False, deterministic=False)
            if self.frame_lengths > 0:
                init_kwargs.update(
                    window_starts=jnp.zeros((mel.shape[0],), jnp.int32),
                    window_frames=self.frame_lengths,
                )
            ae_vars = self.ae.init(
                {"params": r_ae, "dropout": r_drop}, mel, mel_length, **init_kwargs
            )
            wav_win = jnp.zeros(
                (mel.shape[0], max(self.sample_lengths, self.frameshift)),
                jnp.float32,
            )
            d_vars = self.disc.init(r_d, wav_win)
            return {
                "params": {
                    "autoencoder": ae_vars["params"],
                    "discriminator": d_vars["params"],
                },
                "codebook": ae_vars["codebook"],
                # non-trained model state (quantizer norm:True BatchNorm
                # running stats); empty for every shipped recipe
                "model_state": {"batch_stats": ae_vars.get("batch_stats", {})},
                "opt_state": {
                    "autoencoder": self.ae_tx.init(ae_vars["params"]),
                    "discriminator": self.d_tx.init(d_vars["params"]),
                },
            }

        return _init(rng, mel, mel_length)

    # ------------------------------------------------------------ loss parts
    def _stft_loss(self, fake, target):
        if self.stft_loss_func == "mel_loss":
            kwargs = dict(
                sample_rate=self.samplerate,
                win_size=self.samplerate // 20,
                hop_size=self.samplerate // 80,
                num_mels=128,
            )
            kwargs.update(self.stft_loss_config)
            # Derive fft_size from the (possibly overridden) win_size unless
            # the user pinned it explicitly. The reference derives it from the
            # default win_size before applying overrides
            # (msmctts_trainer.py:104-109), which silently mismatches when
            # only win_size is overridden.
            kwargs.setdefault(
                "fft_size", 2048 if kwargs["win_size"] > 1024 else 1024
            )
            sr = kwargs.pop("sample_rate")
            return {
                "mel_loss": mel_loss(
                    fake,
                    target,
                    sr,
                    fft_size=kwargs["fft_size"],
                    hop_size=kwargs["hop_size"],
                    win_size=kwargs["win_size"],
                    num_mels=kwargs["num_mels"],
                )
            }
        return multi_resolution_stft_loss(fake, target, **self.stft_loss_config)

    def _ae_diffable(
        self, params, codebook, mel, mel_length, rng, warmup, windows,
        batch_stats=None,
    ):
        """AE forward returning (differentiable outputs, aux).

        Under bf16 the params/inputs are cast HERE, inside the function the
        vjp closes over, so the cast's transpose accumulates float32 grads
        for the float32 master params."""
        kwargs = dict(warmup=warmup, deterministic=False)
        if windows is not None:
            kwargs["window_starts"] = windows
            kwargs["window_frames"] = self.frame_lengths
        params = cast_floats(params, self.compute_dtype)
        mel = cast_floats(mel, self.compute_dtype)
        variables = {"params": params, "codebook": codebook}
        mutable = ["codebook"]
        if batch_stats:  # quantizer norm:True running stats
            variables["batch_stats"] = batch_stats
            mutable.append("batch_stats")
        out, mut = self.ae.apply(
            variables,
            mel,
            mel_length,
            mutable=mutable,
            rngs={"dropout": rng},
            **kwargs,
        )
        diffable = {"encoder_diffs": out["encoder_diffs"]}
        if "mel_outputs" in out:
            diffable["mel_outputs"] = out["mel_outputs"]
        if out.get("decoder_diffs") is not None:
            diffable["prior_loss"] = out["decoder_diffs"]["total_loss"]
        if not warmup:
            diffable["fake"] = out["decoder_outputs"][..., 0]
        aux = {
            "codebook": mut["codebook"],
            "batch_stats": mut.get("batch_stats", {}),
            "encoder_lengths": [jax.lax.stop_gradient(l) for l in out["encoder_lengths"]],
            "prior_metrics": jax.lax.stop_gradient(
                {k: v for k, v in (out.get("decoder_diffs") or {}).items() if k != "total_loss"}
            ),
        }
        return diffable, aux

    def _codebook_health(self, codebook):
        """Per-stage codeword usage perplexity from the EMA cluster sizes —
        the in-training equivalent of the reference's offline
        vq_analysis.py entropy diagnostic."""
        metrics = {}
        for stage, node in codebook.get("quantizer", {}).items():
            cs = node.get("cluster_size")
            if cs is None:
                continue
            p = cs / jnp.maximum(jnp.sum(cs, axis=-1, keepdims=True), 1e-9)
            entropy = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0), axis=-1)
            metrics[f"codebook_perplexity_{stage}"] = jnp.mean(jnp.exp(entropy))
        return metrics

    def _base_g_loss(self, diffable, aux, mel, mel_length):
        """VQ + prior + frame losses shared by both phases."""
        metrics = self._codebook_health(aux["codebook"])
        prior = {"total_loss": diffable["prior_loss"]} if "prior_loss" in diffable else None
        vq, vq_metrics = quantizer_loss(
            diffable["encoder_diffs"],
            aux["encoder_lengths"],
            prior,
            lambda_vq=self.lambda_vq,
            lambda_pr=self.lambda_pr,
        )
        metrics.update(vq_metrics)
        metrics.update(aux["prior_metrics"])
        g = vq
        if "mel_outputs" in diffable:
            fl = frame_loss(diffable["mel_outputs"], mel, mel_length)
            metrics["frame_loss"] = fl
            g = g + self.lambda_frame * fl
        return g, metrics

    # -------------------------------------------------------------- warmup
    def _warmup_step_impl(self, state, batch, step):
        batch = decode_batch(batch)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), step)
        mel, mel_length = batch["mel"], batch["mel_length"]

        bs = state.get("model_state", {}).get("batch_stats") or None

        def loss_fn(params):
            diffable, aux = self._ae_diffable(
                params, state["codebook"], mel, mel_length, rng, True, None,
                batch_stats=bs,
            )
            g, metrics = self._base_g_loss(diffable, aux, mel, mel_length)
            return g, (aux, metrics)

        (g, (aux, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]["autoencoder"]
        )
        updates, new_opt = self.ae_tx.update(
            grads, state["opt_state"]["autoencoder"], state["params"]["autoencoder"]
        )
        new_ae = optax.apply_updates(state["params"]["autoencoder"], updates)
        metrics["g_loss"] = g
        new_state = {
            "params": {
                "autoencoder": new_ae,
                "discriminator": state["params"]["discriminator"],
            },
            "codebook": aux["codebook"],
            "model_state": {"batch_stats": aux["batch_stats"]},
            "opt_state": {
                "autoencoder": new_opt,
                "discriminator": state["opt_state"]["discriminator"],
            },
        }
        return new_state, self._pack_metrics("warmup", metrics)

    # ----------------------------------------------------------------- GAN
    def _gan_step_impl(self, state, batch, step):
        batch = decode_batch(batch)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), step)
        mel, mel_length = batch["mel"], batch["mel_length"]
        wav = batch["wav"]
        B = mel.shape[0]
        r_win, r_drop = jax.random.split(rng)

        if self.frame_lengths == -1:
            # sample_lengths == -1: decode full utterances, no windowing
            starts = None
            target = wav
        else:
            # Per-utterance random windows (msmctts_trainer.py:211-219):
            # start in [0, max(1, len - frames)).
            maxval = jnp.maximum(
                mel_length.astype(jnp.int32) - self.frame_lengths, 1
            )
            starts = jax.random.randint(r_win, (B,), 0, maxval)
            target = jax.vmap(
                lambda w, s: jax.lax.dynamic_slice(
                    w, (s * self.frameshift,), (self.sample_lengths,)
                )
            )(wav, starts)

        # One AE forward; residuals saved for the generator backward.
        bs = state.get("model_state", {}).get("batch_stats") or None

        def fwd(params):
            return self._ae_diffable(
                params, state["codebook"], mel, mel_length, r_drop, False, starts,
                batch_stats=bs,
            )

        diffable, ae_vjp, aux = jax.vjp(fwd, state["params"]["autoencoder"], has_aux=True)
        fake = diffable["fake"]

        target_c = cast_floats(target, self.compute_dtype)

        # --- discriminator update on (stop_grad(fake), real) ---
        def d_loss_fn(pd):
            pd = cast_floats(pd, self.compute_dtype)
            fs, _, rs, _ = paired_disc_apply(
                self.disc, pd, jax.lax.stop_gradient(fake), target_c
            )
            real_l, fake_l = lsgan_d_loss(rs, fs)
            return real_l + fake_l, (real_l, fake_l)

        (d_loss, (d_real, d_fake)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state["params"]["discriminator"])
        d_updates, new_d_opt = self.d_tx.update(
            d_grads,
            state["opt_state"]["discriminator"],
            state["params"]["discriminator"],
        )
        new_d_params = optax.apply_updates(state["params"]["discriminator"], d_updates)

        # --- generator loss against the UPDATED discriminator ---
        def g_loss_fn(dif):
            g, metrics = self._base_g_loss(dif, aux, mel, mel_length)
            stft_terms = self._stft_loss(dif["fake"], target)
            stft_sum = sum(stft_terms.values())
            for k, v in stft_terms.items():
                metrics[k] = v
            metrics["stft_loss"] = stft_sum
            g = g + self.lambda_stft * stft_sum

            pd = cast_floats(new_d_params, self.compute_dtype)
            fs, ff, _, rf = paired_disc_apply(self.disc, pd, dif["fake"], target_c)
            adv = lsgan_g_loss(fs)
            fm = feature_matching_loss(ff, rf)
            lam = (
                jax.lax.stop_gradient(g / jnp.maximum(fm, 1e-12))
                if self.lambda_fm == "auto"
                else self.lambda_fm
            )
            adv_total = adv + fm * lam
            g_total = g + adv_total
            metrics["fm_loss"] = fm
            metrics["adv_loss"] = adv_total
            metrics["g_loss"] = g_total
            return g_total, metrics

        (g_total, g_metrics), out_ct = jax.value_and_grad(g_loss_fn, has_aux=True)(
            diffable
        )
        (ae_grads,) = ae_vjp(out_ct)
        ae_updates, new_ae_opt = self.ae_tx.update(
            ae_grads,
            state["opt_state"]["autoencoder"],
            state["params"]["autoencoder"],
        )
        new_ae_params = optax.apply_updates(state["params"]["autoencoder"], ae_updates)

        metrics = dict(g_metrics)
        metrics.update(d_loss=d_loss, d_loss_real=d_real, d_loss_fake=d_fake)
        new_state = {
            "params": {"autoencoder": new_ae_params, "discriminator": new_d_params},
            "codebook": aux["codebook"],
            "model_state": {"batch_stats": aux["batch_stats"]},
            "opt_state": {"autoencoder": new_ae_opt, "discriminator": new_d_opt},
        }
        return new_state, self._pack_metrics("gan", metrics)

    # ------------------------------------------------------------------ api
    def evaluate(self, batch, logger, iteration):
        """Analysis-synthesis of the first batch utterance: waveform +
        predicted-mel heatmap to tensorboard (recipe check #1 online)."""
        import numpy as np

        if logger.writer is None:
            return
        if self._eval_fn is None:
            def _eval(params, codebook, batch_stats, mel, mel_length):
                variables = {"params": params, "codebook": codebook}
                if batch_stats:  # quantizer norm:True running stats
                    variables["batch_stats"] = batch_stats
                out = self.ae.apply(
                    variables,
                    mel,
                    mel_length,
                    deterministic=True,
                )
                return out["decoder_outputs"], out.get("mel_outputs")
            self._eval_fn = jax.jit(_eval)

        # read through the process-local shard: batch leaves are global
        # jax.Arrays and row 0 is non-addressable on multi-host (mesh.py)
        from msmctts_tpu.parallel.mesh import host_local_rows

        mel = jnp.asarray(host_local_rows(batch["mel"], 1))
        length = jnp.asarray(host_local_rows(batch["mel_length"], 1))
        wav, pred_mel = self._eval_fn(
            self.state["params"]["autoencoder"], self.state["codebook"],
            self.state.get("model_state", {}).get("batch_stats", {}), mel, length
        )
        wav = np.asarray(wav)[0, : int(length[0]) * (wav.shape[1] // mel.shape[1]), 0]
        payload = {"audio": {"eval/wav": (wav, self.samplerate)}}
        if pred_mel is not None:
            m = np.asarray(pred_mel)[0, : int(length[0])].T  # [D, T]
            m = (m - m.min()) / max(m.max() - m.min(), 1e-6)
            payload["image"] = {"eval/pred_mel": m[..., None]}
        logger.log(iteration, payload)

    def train_step(self, state, batch, iteration):
        import numpy as np
        step = np.uint32(iteration)
        if iteration <= self.warmup_steps:
            batch = {k: batch[k] for k in ("mel", "mel_length")}
            state, vec = self._warmup_step(state, batch, step)
            return state, self._unpack_metrics("warmup", vec)
        batch = {k: batch[k] for k in ("mel", "mel_length", "wav")}
        state, vec = self._gan_step(state, batch, step)
        return state, self._unpack_metrics("gan", vec)
