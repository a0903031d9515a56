#!/usr/bin/env python
"""Multi-host training launcher.

The reference's ``train_dist.py`` spawns one ``train.py`` process per local
GPU (train_dist.py:14-36; and has drifted — its --num_gpus handling is
broken, SURVEY.md 2.1). Under JAX SPMD one process drives every local
device, so the launcher's only remaining job is multi-HOST orchestration:
run one ``train.py`` per host with a shared coordinator address.

Single host (all local devices): just run train.py directly.

    python train_dist.py -c cfg.yaml --hosts host0:1234 --process-id 0
    # ... and on host1:
    python train_dist.py -c cfg.yaml --hosts host0:1234 --process-id 1 \
        --num-processes 2
"""

import argparse
import os
import subprocess
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--hosts", default=None,
                        help="coordinator host:port (first host)")
    parser.add_argument("--process-id", type=int, default=0)
    parser.add_argument("--num-processes", type=int, default=1)
    args, passthrough = parser.parse_known_args()

    cmd = [sys.executable, "train.py", "-c", args.config] + passthrough
    if args.hosts and args.num_processes > 1:
        cmd += [
            "--coordinator", args.hosts,
            "--num-processes", str(args.num_processes),
            "--process-id", str(args.process_id),
        ]
    os.execv(sys.executable, cmd)


if __name__ == "__main__":
    main()
