"""Training logger: file log + tensorboard scalars/images/audio.

Ports the reference Logger/LossMeter (utils/logger.py:32-102): scalars are
averaged over a window and flushed every ``interval`` steps; images and
audio pass straight through. tensorboardX is optional — absent, scalars
still go to the text log.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict

import numpy as np


class LossMeter:
    def __init__(self, writer, interval: int = 100):
        self.writer = writer
        self.interval = interval
        self.sums = defaultdict(float)
        self.counts = defaultdict(int)

    def update(self, iteration: int, scalars: dict):
        for k, v in scalars.items():
            self.sums[k] += float(v)
            self.counts[k] += 1
        if iteration % self.interval == 0 and self.writer is not None:
            for k in list(self.sums):
                mean = self.sums[k] / max(self.counts[k], 1)
                self.writer.add_scalar(k, mean, iteration)
            self.sums.clear()
            self.counts.clear()


class Logger:
    def __init__(self, log_dir: str, rank: int = 0, use_tensorboard: bool = True):
        self.rank = rank
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d-%H%M%S")
        self.log_path = os.path.join(log_dir, f"train_rank{rank}_{stamp}.log")
        self.writer = None
        if use_tensorboard and rank == 0:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(os.path.join(log_dir, f"events_{stamp}"))
            except Exception:
                self.writer = None
        self.meter = LossMeter(self.writer)

    def text(self, message: str):
        line = f"[{time.strftime('%H:%M:%S')}] {message}"
        with open(self.log_path, "a") as f:
            f.write(line + "\n")

    def log_config(self, config: dict):
        self.text("config: " + json.dumps(config, default=str))

    def log(self, iteration: int, payload: dict):
        """payload keys: 'loss' (dict of scalars), 'image' (dict name->HWC
        array), 'audio' (dict name->(wav, sr))."""
        scalars = payload.get("loss", {})
        if scalars:
            self.meter.update(iteration, scalars)
        if self.writer is not None:
            for name, img in payload.get("image", {}).items():
                self.writer.add_image(name, np.asarray(img), iteration, dataformats="HWC")
        for name, (wav, sr) in payload.get("audio", {}).items():
            try:
                if self.writer is None:
                    raise RuntimeError("no tensorboard writer")
                self.writer.add_audio(
                    name, np.asarray(wav)[None, :], iteration, sample_rate=sr
                )
            except Exception:
                # tensorboardX audio needs soundfile; fall back to wav files
                from msmctts_tpu.data.datasets import save_wav

                out_dir = os.path.join(self.log_dir, "eval_audio")
                os.makedirs(out_dir, exist_ok=True)
                fname = name.replace("/", "_") + f"_{iteration}.wav"
                save_wav(os.path.join(out_dir, fname), np.asarray(wav), sr)

    def close(self):
        if self.writer is not None:
            self.writer.close()
