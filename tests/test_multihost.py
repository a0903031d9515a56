"""Multi-host (multi-process) execution: the 2-process `jax.distributed`
path that single-process virtual meshes cannot cover.

Two REAL processes run the actual ``train.py`` CLI (``--coordinator``,
``--num-processes``, ``--process-id``) against the same tiny corpus, each
with 4 virtual CPU devices (8 global, Gloo collectives), each loading its
contiguous block of every global batch (``DataLoader shard=(rank, 2)``).
A third single-process run over 8 virtual devices trains the same config.
Because the loader's contiguous-block sharding reproduces the global batch
order exactly (see data/loader.py:_index_stream) and codebook statistics
are global psums, the two checkpoints must agree to collective-reduction
rounding.

Reference equivalent (never parity-tested there): train_dist.py:14-36 +
distributed/distributed.py:21-31 (NCCL process group; per-rank codebooks
drift — SURVEY.md 2.9).
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from msmctts_tpu.utils.checkpoint import load_checkpoint
from tests.tiny import tiny_ae_config, write_tiny_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 23000 + os.getpid() % 2000


def _write_config(corpus: str, save_dir: str) -> str:
    config = tiny_ae_config(corpus).to_dict()
    config["save_checkpoint_dir"] = save_dir
    # batch 8 divides the 8-device data axis exactly: no pad rows, so the
    # multi-process global batch is literally the single-process batch
    config["dataloader"]["batch_size"] = 8
    path = os.path.join(save_dir, "config.yaml")
    os.makedirs(save_dir, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config, f)
    return path


def _env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    # share the suite's persistent compile cache across the processes
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(__file__), ".jax_cache"
    )
    return env


def _train_cmd(cfg: str, extra=()):
    return [
        sys.executable, os.path.join(REPO, "train.py"),
        "-c", cfg, "--max-steps", "4", "--log-every", "2",
        "--platform", "cpu", *extra,
    ]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    corpus = str(tmp_path / "corpus")
    write_tiny_dataset(corpus, n_utts=8)

    # ---- 2 processes x 4 devices, real jax.distributed over localhost
    cfg_mh = _write_config(corpus, str(tmp_path / "mh"))
    procs = []
    for rank in range(2):
        procs.append(
            subprocess.Popen(
                _train_cmd(cfg_mh, (
                    "--coordinator", f"localhost:{PORT}",
                    "--num-processes", "2", "--process-id", str(rank),
                )),
                cwd=REPO, env=_env(4),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    # ---- same config, one process x 8 devices
    cfg_sp = _write_config(corpus, str(tmp_path / "sp"))
    sp = subprocess.run(
        _train_cmd(cfg_sp), cwd=REPO, env=_env(8),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=1500,
    )
    assert sp.returncode == 0, sp.stdout.decode(errors="replace")[-4000:]

    mh = load_checkpoint(str(tmp_path / "mh" / "model_4"))
    spc = load_checkpoint(str(tmp_path / "sp" / "model_4"))
    assert mh["iteration"] == spc["iteration"] == 4

    # codebook EMA state: global masked sums -> must match to reduction
    # rounding (Gloo cross-process vs single-process reduce order)
    for stage, cb in spc["state"]["codebook"]["quantizer"].items():
        for name in ("embed", "cluster_size", "embed_avg"):
            np.testing.assert_allclose(
                mh["state"]["codebook"]["quantizer"][stage][name],
                cb[name], rtol=2e-4, atol=2e-5,
                err_msg=f"{stage}.{name}",
            )

    # trained parameters (both submodules)
    flat_sp = _flatten(spc["state"]["params"])
    flat_mh = _flatten(mh["state"]["params"])
    assert flat_sp.keys() == flat_mh.keys()
    for k in flat_sp:
        np.testing.assert_allclose(
            flat_mh[k], flat_sp[k], rtol=2e-3, atol=2e-4, err_msg=k
        )


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out
