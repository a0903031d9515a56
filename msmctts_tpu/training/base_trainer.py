"""Common training loop.

Ports the reference ``BaseTrainer`` (trainers/base_trainer.py:16-142):
dataloader/optimizer construction from config, auto-resume (latest
``model_*`` in the save dir, else ``restore_checkpoint_path``, else fresh
init + optional ``pretrain_checkpoint_path``), per-step logging through
``Logger``, checkpoints every ``iters_per_checkpoint`` with the full config
embedded.

TPU redesign: the entire optimization step (losses, both GAN phases, EMA
codebook update, optimizer updates) is one jitted pure function over a
train-state pytree, compiled per batch-shape bucket; batches are sharded
over the mesh ``data`` axis and state is replicated (SURVEY.md 2.9's
pjit north star). Only process 0 writes checkpoints/logs.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from msmctts_tpu.config import component_kwargs
from msmctts_tpu.data.loader import DataLoader
from msmctts_tpu.data.wire import DevicePrefetcher, decode_batch
from msmctts_tpu.parallel.mesh import pad_batch_to_devices
from msmctts_tpu.parallel.sharding import mesh_from_config, shard_state
from msmctts_tpu.registry import get_dataset
from msmctts_tpu.utils.checkpoint import (
    find_latest_checkpoint,
    load_checkpoint,
    merge_states,
    save_checkpoint,
    save_checkpoint_orbax,
    wait_for_pending_saves,
)
from msmctts_tpu.utils.logger import Logger


def build_dataset_from_config(config, training: bool = True, id_list=None):
    node = dict(config.dataset)
    name = node.pop("_name")
    kwargs = component_kwargs(node)
    if id_list is not None:
        kwargs["id_list"] = id_list
    kwargs["training"] = training
    kwargs.setdefault("seed", config.get("seed", 1234))
    return get_dataset(name)(**kwargs)


class PackedMetrics:
    """Mapping over a single packed metrics vector.

    Host transfers of individual device scalars carry a large fixed latency
    (one D2H round trip each); the jitted steps therefore pack all metrics
    into ONE float32 vector, and this view fetches it with a single
    transfer on first access."""

    def __init__(self, names, vec):
        self._names = names
        self._vec = vec
        self._host = None

    def _fetch(self):
        if self._host is None:
            self._host = np.asarray(self._vec)
        return self._host

    def __getitem__(self, key):
        return self._fetch()[self._names.index(key)]

    def __contains__(self, key):
        return key in self._names

    def __iter__(self):
        return iter(self._names)

    def keys(self):
        return self._names

    def items(self):
        host = self._fetch()
        return [(k, host[i]) for i, k in enumerate(self._names)]

    def to_host(self):
        return {k: float(v) for k, v in self.items()}


class BaseTrainer:
    def __init__(self, config, task, mesh=None):
        self._metric_names = {}
        self.config = config
        self.task = task
        self.mesh = mesh if mesh is not None else mesh_from_config(config)
        # batches are sharded over the 'data' axis only; a 'model' axis (if
        # any) shards parameters (parallel/sharding.py), not the batch
        self.n_devices = int(self.mesh.shape.get("data", 1))
        self.save_dir = config.get("save_checkpoint_dir", "checkpoints")
        self.training_steps = int(config.get("training_steps", 1_000_000))
        self.iters_per_checkpoint = int(config.get("iters_per_checkpoint", 50_000))
        self.seed = int(config.get("seed", 1234))
        self.state = None
        self.iteration = 0

    # --------------------------------------------------------- metric packing
    def _pack_metrics(self, tag: str, metrics: dict):
        """Inside a jitted step: pack the metrics dict into one f32 vector
        (trace-time side effect records the name order for unpacking)."""
        import jax.numpy as jnp

        names = tuple(sorted(metrics))
        self._metric_names[tag] = names
        return jnp.stack(
            [jnp.reshape(jnp.asarray(metrics[k], jnp.float32), ()) for k in names]
        )

    def _unpack_metrics(self, tag: str, vec) -> PackedMetrics:
        return PackedMetrics(self._metric_names[tag], vec)

    # ------------------------------------------------------ to be overridden
    def init_state(self, rng, sample_batch) -> dict:
        raise NotImplementedError

    def train_step(self, state, batch, iteration):
        """Returns (new_state, metrics dict of scalars)."""
        raise NotImplementedError

    def evaluate(self, batch, logger, iteration):
        """Periodic qualitative eval (audio/image summaries). The reference
        threads an ``eval_inteval_iters`` knob through every trainer but
        never uses it (msmctts_trainer.py:78); here it drives this hook."""

    # ----------------------------------------------------------- checkpoints
    def attempt_resume(self, rng, sample_batch):
        """Reference resume ladder (base_trainer.py:104-119)."""
        self.state = self.init_state(rng, sample_batch)
        latest = (
            find_latest_checkpoint(self.save_dir)
            if self.config.get("resume_training", True)
            else None
        )
        restore = self.config.get("restore_checkpoint_path") or None
        pretrain = self.config.get("pretrain_checkpoint_path") or None
        path = latest or restore
        if isinstance(path, (list, tuple)):
            # checkpoint stitching: [[module_regex, path], ...]
            # (reference utils.py:209-221)
            from msmctts_tpu.utils.checkpoint import filter_state_by_regex

            for pattern, part_path in path:
                part = load_checkpoint(part_path)
                subset = filter_state_by_regex(part["state"], pattern)
                self.state = merge_states(self.state, subset)
        elif path:
            # target=self.state restores optax NamedTuple states with their
            # real types under the orbax backend (no-op for pickle)
            ckpt = load_checkpoint(path, target=self.state)
            self.state = merge_states(self.state, ckpt["state"])
            self.iteration = int(ckpt["iteration"])
        elif pretrain:
            ckpt = load_checkpoint(pretrain)
            # init-only: model weights, no optimizer state / iteration
            model_only = {
                k: ckpt["state"][k]
                for k in ("params", "codebook", "model_state")
                if k in ckpt["state"]
            }
            self.state = merge_states(self.state, model_only)
        self.state = shard_state(self.state, self.mesh)

    def save(self):
        if jax.process_index() != 0:
            return
        self._last_saved_iteration = self.iteration
        path = os.path.join(self.save_dir, f"model_{self.iteration}")
        cfg = self.config.to_dict() if hasattr(self.config, "to_dict") else dict(self.config)
        if str(self.config.get("checkpoint_backend", "pickle")) == "orbax":
            # async: the step loop continues while orbax serializes
            save_checkpoint_orbax(path, self.state, self.iteration, cfg)
        else:
            save_checkpoint(path, self.state, self.iteration, cfg)
        # opt-in GC: keep every-N snapshots (reference utils.py:260-270,
        # effectively disabled there; enabled here via config)
        keep = self.config.get("checkpoint_keep_interval")
        if keep:
            from msmctts_tpu.utils.checkpoint import clean_checkpoint_directory

            clean_checkpoint_directory(self.save_dir, int(keep))

    # ------------------------------------------------------------------ loop
    def train(
        self,
        max_steps: Optional[int] = None,
        log_every: int = 50,
        profile_dir: Optional[str] = None,
        profile_start: int = 10,
        profile_steps: int = 5,
    ):
        """``profile_dir`` captures a jax.profiler trace of steps
        [profile_start, profile_start + profile_steps) — the TPU-native
        replacement for the reference's (disabled) NVTX ranges
        (transformer.py:43-61, SURVEY.md 5)."""
        dl_cfg = self.config.get("dataloader", {})
        dataset = build_dataset_from_config(self.config, training=True)
        # Config batch_size is GLOBAL (train.py contract); each process
        # loads its 1/world block of every global batch and pads it to its
        # LOCAL slice of the data axis (the global array assembled by
        # shard_batch is then a multiple of the full data-axis size).
        world = jax.process_count()
        global_batch = int(dl_cfg.get("batch_size", 16))
        per_process = max(1, global_batch // world)
        local_data_devices = max(1, self.n_devices // world)
        loader = DataLoader(
            dataset,
            batch_size=per_process,
            shuffle=True,
            num_workers=int(dl_cfg.get("num_workers", 4)),
            seed=self.seed,
            shard=(jax.process_index(), world),
        )

        it = iter(loader)
        sample = pad_batch_to_devices(next(it), local_data_devices)
        rng = jax.random.PRNGKey(self.seed)
        # init_state's flax init runs a real forward, so data-dependent
        # state (codebook EMA stats) depends on the init batch. Each
        # process only holds its block of global batch 0 — gather the full
        # batch so every process initializes identical state (required by
        # the replicated device_put in shard_state, and what makes
        # multi-host init bit-identical to single-host).
        init_sample = sample
        if world > 1:
            from jax.experimental import multihost_utils

            init_sample = jax.tree_util.tree_map(
                lambda x: np.asarray(
                    multihost_utils.process_allgather(np.asarray(x), tiled=True)
                ),
                sample,
            )
        self.attempt_resume(rng, init_sample)

        # Batches are wire-encoded (int16 PCM; data/wire.py) and uploaded to
        # the mesh by a background thread so the H2D transfer overlaps step
        # N-1's device execution instead of sitting on the loop's critical
        # path. Steps decode in-jit (decode_batch), so numerics for
        # PCM-sourced audio are unchanged.
        feed = DevicePrefetcher(
            it,
            self.mesh,
            local_data_devices,
            mode=dl_cfg.get("wire_compression", True),
            depth=int(dl_cfg.get("device_prefetch", 2)),
            first=sample,
        )

        logger = Logger(self.save_dir, rank=jax.process_index())
        logger.log_config(
            self.config.to_dict() if hasattr(self.config, "to_dict") else dict(self.config)
        )
        stop_at = min(
            self.training_steps,
            self.iteration + max_steps if max_steps is not None else self.training_steps,
        )

        # Graceful preemption (TPU pods are preemptible in production; the
        # reference has no equivalent, SURVEY.md 5 "failure detection"):
        # SIGTERM/SIGINT set a flag, the loop finishes the in-flight step,
        # saves a resumable checkpoint and returns cleanly. Auto-resume
        # then continues from the preemption point instead of the last
        # periodic snapshot.
        import signal

        preempted = []
        prev_handlers = {}

        def _on_signal(signum, frame):
            preempted.append(signum)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # non-main thread (tests) — skip installing
                break

        t0 = time.time()
        profiling = False
        self._last_saved_iteration = None
        # evaluate() consumes host-semantics features (float wav/mel), not
        # wire-encoded leaves — decode on device in one compiled program
        decode = jax.jit(decode_batch)
        try:
            while self.iteration < stop_at and not preempted:
                self.iteration += 1
                if profile_dir and self.iteration == profile_start:
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                sharded = next(feed)  # encoded + uploaded in the background
                self.state, metrics = self.train_step(
                    self.state, sharded, self.iteration
                )
                if profiling and self.iteration >= profile_start + profile_steps - 1:
                    jax.block_until_ready(self.state)
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.text(f"profiler trace written to {profile_dir}")

                if self.iteration % log_every == 0:
                    host = (
                        metrics.to_host()
                        if hasattr(metrics, "to_host")
                        else {k: float(v) for k, v in metrics.items()}
                    )
                    dt = (time.time() - t0) / log_every
                    host["steps_per_sec"] = 1.0 / max(dt, 1e-9)
                    logger.log(self.iteration, {"loss": host})
                    logger.text(
                        f"step {self.iteration} "
                        + " ".join(f"{k}={v:.4f}" for k, v in host.items())
                    )
                    t0 = time.time()

                eval_every = getattr(self, "eval_interval", 0)
                if eval_every and self.iteration % eval_every == 0:
                    try:
                        self.evaluate(decode(sharded), logger, self.iteration)
                    except Exception as e:  # eval must never kill training
                        logger.text(f"evaluate() failed at {self.iteration}: {e}")

                if self.iteration % self.iters_per_checkpoint == 0:
                    self.save()

            if preempted:
                logger.text(
                    f"signal {preempted[0]} received - checkpointing at "
                    f"iteration {self.iteration} and exiting"
                )
            if self._last_saved_iteration != self.iteration:
                self.save()  # final/preemption snapshot (skip if just saved)
        finally:
            # An exception mid-step must still release the feed thread,
            # restore the process-wide signal handlers, flush the logger,
            # and make any in-flight async orbax snapshot durable.
            feed.close()
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)
            wait_for_pending_saves()
            logger.close()
        return self.state
