#!/usr/bin/env python
"""Training CLI.

Usage parity with the reference ``train.py`` (reference train.py:32-71):

    python train.py -c examples/csmsc/configs/msmc_vq_gan.yaml

Differences from the reference: there is no ``--rank`` — JAX SPMD uses all
local devices through one process (multi-host runs launch one process per
host and initialize ``jax.distributed``; pass ``--coordinator`` on each
host). Batch size in the config is the GLOBAL batch (the reference divides
by world size, train.py:19-20 — here the mesh shards it).
"""

import argparse

from msmctts_tpu.config import Config
from msmctts_tpu.registry import get_trainer
from msmctts_tpu.tasks import build_task


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--max-steps", type=int, default=None,
                        help="stop after N steps (debug)")
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of a few steps")
    parser.add_argument("--coordinator", default=None,
                        help="host:port for multi-host jax.distributed init")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. 'cpu'); needed "
                        "instead of JAX_PLATFORMS when the interpreter "
                        "pre-imports jax (see tests/conftest.py)")
    args = parser.parse_args()

    from msmctts_tpu.utils.platform import honor_env_platform

    honor_env_platform(args.platform)
    from msmctts_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    if args.coordinator:
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    config = Config(args.config)
    task = build_task(config, mode="train")
    from msmctts_tpu.config import component_kwargs

    name = config.trainer["_name"]
    trainer = get_trainer(name)(config, task, **component_kwargs(config.trainer))
    trainer.train(
        max_steps=args.max_steps,
        log_every=args.log_every,
        profile_dir=args.profile,
    )


if __name__ == "__main__":
    main()
