"""Graceful preemption: SIGTERM mid-training checkpoints the in-flight
iteration and exits cleanly (production TPU pods are preemptible; the
reference's only durability is periodic snapshots, SURVEY.md 5)."""

import os
import signal
import subprocess
import sys
import time

import pytest
import yaml

from tests.tiny import tiny_ae_config, write_tiny_dataset

# spawns train.py in a fresh interpreter (full jax import + CLI compile)
pytestmark = pytest.mark.slow


def test_sigterm_saves_and_exits(tmp_path):
    corpus = str(tmp_path / "corpus")
    write_tiny_dataset(corpus)
    config = tiny_ae_config(corpus)
    ckpt_dir = str(tmp_path / "ckpt")
    config["save_checkpoint_dir"] = ckpt_dir
    config["training_steps"] = 10000
    config["iters_per_checkpoint"] = 100000  # only a preemption can save
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config.to_dict(), f)

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        # share the suite's persistent compile cache (tests/conftest.py)
        JAX_COMPILATION_CACHE_DIR=os.path.join(os.path.dirname(__file__), ".jax_cache"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="2",
        JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="-1",
    )
    proc = subprocess.Popen(
        [sys.executable, "train.py", "-c", cfg_path, "--log-every", "1"],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    try:
        # wait until it is actually stepping; the preemption flag is
        # checked at the loop boundary, so signalling right after step 1
        # exits before the GAN-phase compile ever starts
        deadline = time.time() + 600
        log = None
        while time.time() < deadline:
            logs = [f for f in os.listdir(ckpt_dir) if f.startswith("train_rank0")] \
                if os.path.isdir(ckpt_dir) else []
            if logs:
                log = os.path.join(ckpt_dir, sorted(logs)[-1])
                with open(log) as f:
                    if "step 1 " in f.read():
                        break
            time.sleep(0.25)
        assert log is not None, "training never started"

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=420)
        assert proc.returncode == 0, out.decode()[-2000:]
    finally:
        if proc.poll() is None:
            proc.kill()

    snaps = [f for f in os.listdir(ckpt_dir) if f.startswith("model_")]
    assert snaps, "no preemption checkpoint written"
    with open(log) as f:
        assert "checkpointing at iteration" in f.read()
