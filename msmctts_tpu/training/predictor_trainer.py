"""Acoustic-model (MultiStagePredictor) trainer.

Reference: trainers/msmctts_trainer.py:222-295. Per step: the frozen
autoencoder's ``analysis`` produces teacher MSMCR targets under
stop-gradient (no codebook update — the reference AE is in eval mode);
the predictor is teacher-forced on them; loss = per-stage embedding losses
(``mse`` / ``softmax`` / ``triple*`` via the AE's codebooks,
msmc_vqgan.py:236-273) + masked duration MSE; grads clipped and applied to
the predictor only.

The whole step — frozen analysis included — is one jitted function, so the
teacher forward fuses into the same XLA program as the predictor
forward/backward (the reference pays a separate no_grad forward,
msmctts_trainer.py:245-253).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from msmctts_tpu.data.wire import decode_batch
from msmctts_tpu.parallel.precision import cast_floats, compute_dtype
from msmctts_tpu.registry import register_trainer
from msmctts_tpu.tasks import load_frozen_autoencoder
from msmctts_tpu.training.base_trainer import BaseTrainer
from msmctts_tpu.training.losses import duration_loss
from msmctts_tpu.training.optim import build_optimizer, optimizer_config_for


@register_trainer("PredictorTrainer")
class PredictorTrainer(BaseTrainer):
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

        self.compute_dtype = compute_dtype(config)
        # The frozen teacher AE loads lazily at the first step (reference
        # builds it lazily too, msmctts_trainer.py:288-295) so trainer
        # construction never needs the checkpoint file on disk.
        self.ae = None
        self.ae_variables = None

        lr_cfg = config.get("lr_scheduler")
        self.tx = build_optimizer(
            optimizer_config_for(config, "predictor"), lr_cfg, grad_clip_thresh,
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
        # frozen teacher runs in the compute dtype (codebook stays fp32)
        self.ae_variables = dict(
            self.ae_variables,
            params=cast_floats(self.ae_variables["params"], self.compute_dtype),
        )

    def init_state(self, rng, batch):
        self._ensure_autoencoder()
        arrays = {
            k: jnp.asarray(batch[k])
            for k in ("mel", "mel_length", "text", "text_length", "dur")
        }

        @jax.jit
        def _init(rng, b):
            r_p, r_drop = jax.random.split(rng)
            q = self.ae.apply(
                self.ae_variables, b["mel"], b["mel_length"],
                method="analysis", deterministic=True,
            )
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
        mel = cast_floats(batch["mel"], self.compute_dtype)
        mel_length = batch["mel_length"]
        text, text_length = batch["text"], batch["text_length"]
        dur = batch["dur"]

        # Frozen teacher analysis (fused into the step graph).
        q = self.ae.apply(
            self.ae_variables, mel, mel_length, method="analysis", deterministic=True
        )
        q = jax.lax.stop_gradient(q)
        feat = q["quantizer_outputs"]
        feat_length = q["quantizer_lengths"]

        def loss_fn(params):
            params = cast_floats(params, self.compute_dtype)
            out = self.predictor.apply(
                {"params": params},
                text,
                text_length,
                dur=dur,
                feat=feat,
                feat_length=feat_length,
                deterministic=False,
                rngs={"dropout": rng},
            )
            emb = self.ae.apply(
                self.ae_variables,
                out["feat"],
                out["feat_length"],
                q,
                methods=self.training_methods,
                loss_weights=self.loss_weights,
                method="compute_embedding_loss",
            )
            metrics = {k: v for k, v in emb.items() if k != "total_loss"}
            total = emb["total_loss"]
            dl = duration_loss(out["duration"], dur, text_length) * self.lambda_dur
            metrics["duration_loss"] = dl
            total = total + dl
            metrics["total_loss"] = total
            return total, metrics

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]["predictor"]
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, new_opt = self.tx.update(
            grads, state["opt_state"]["predictor"], state["params"]["predictor"]
        )
        new_params = optax.apply_updates(state["params"]["predictor"], updates)
        return (
            {"params": {"predictor": new_params}, "opt_state": {"predictor": new_opt}},
            self._pack_metrics("step", metrics),
        )

    def train_step(self, state, batch, iteration):
        import numpy as np
        batch = {
            k: batch[k]
            for k in ("mel", "mel_length", "text", "text_length", "dur")
        }
        state, vec = self._step(state, batch, np.uint32(iteration))
        return state, self._unpack_metrics("step", vec)
