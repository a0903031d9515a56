"""Wire-format compression + background device upload for the train feed.

Remote- or network-attached TPUs pay a fixed per-transfer dispatch floor
plus bounded host->device bandwidth, and ``shard_batch`` is otherwise on
the step loop's critical path (the reference's CUDA loop hides its H2D
copies behind pinned-memory ``.cuda(non_blocking)``,
msmctts/trainers/base_trainer.py:70-75 — this is the TPU equivalent).

Three cooperating pieces:

* ``encode_batch`` (host): PCM-sourced waveforms ride the wire as int16 —
  an EXACT round-trip for anything read from 16-bit audio (every dataset
  wav here; load_wav divides the PCM ints by 32768) — and, in ``'full'``
  mode, dense float features (mel/emb/pitch/energy) as bfloat16.
* ``decode_batch`` (device): inverse, called INSIDE the jitted train step
  so XLA fuses the dequantize into each tensor's first consumer (zero extra
  HBM round-trips).
* ``DevicePrefetcher``: pads/encodes/uploads batch N+1 on a worker thread
  while the TPU executes step N, taking the whole transfer off the
  critical path.

Config surface: ``dataloader.wire_compression: true | false | full``
(default true = int16 wav only, which does not change any training
numerics for PCM-sourced audio).
"""

from __future__ import annotations

import queue
import threading

import jax.numpy as jnp
import numpy as np

from msmctts_tpu.parallel.mesh import pad_batch_to_devices, shard_batch

_WAV_SCALE = 32768.0
# dense float features worth bf16-ing in 'full' mode (never targets that
# must stay exact: lengths, text/dur, ids)
_FULL_KEYS = ("mel", "emb", "pitch", "energy")


def encode_batch(batch: dict, mode) -> dict:
    """Host-side wire encoding. ``mode``: falsy = off, True/'wav' = int16
    waveforms, 'full' = int16 waveforms + bfloat16 dense features."""
    if not mode:
        return batch
    out = dict(batch)
    wav = out.get("wav")
    if wav is not None and np.issubdtype(np.asarray(wav).dtype, np.floating):
        q = np.clip(np.round(np.asarray(wav) * _WAV_SCALE), -32768, 32767)
        out["wav"] = q.astype(np.int16)
    if mode == "full":
        for k in _FULL_KEYS:
            v = out.get(k)
            if v is not None and np.asarray(v).dtype == np.float32:
                out[k] = np.asarray(v).astype(jnp.bfloat16)
    return out


def decode_batch(batch: dict) -> dict:
    """In-jit inverse of ``encode_batch`` (a no-op on unencoded batches).

    Keyed on the SAME (key, dtype) pairs ``encode_batch`` produces — never
    on dtype alone, so a future feature natively carried as int16/bfloat16
    (e.g. compact token ids) cannot be silently rescaled."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "dtype"):
            if k == "wav" and v.dtype == jnp.int16:
                v = v.astype(jnp.float32) / _WAV_SCALE
            elif k in _FULL_KEYS and v.dtype == jnp.bfloat16:
                v = v.astype(jnp.float32)
        out[k] = v
    return out


class DevicePrefetcher:
    """Wraps a host batch iterator; a worker thread pads, wire-encodes and
    uploads (``shard_batch``) ``depth`` batches ahead of the consumer."""

    def __init__(self, it, mesh, n_devices: int, mode=True, depth: int = 2,
                 first: dict | None = None):
        self._it = it
        self._mesh = mesh
        self._n = n_devices
        self._mode = mode
        self._first = first
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._worker, name="device-prefetch", daemon=True
        )
        self._thread.start()

    def _upload(self, batch: dict):
        batch = pad_batch_to_devices(batch, self._n)
        return shard_batch(encode_batch(batch, self._mode), self._mesh)

    def _worker(self):
        try:
            if self._first is not None:
                self._put(self._upload(self._first))
                self._first = None
            for batch in self._it:
                if self._stop.is_set() or not self._put(self._upload(batch)):
                    return
            self._put(StopIteration())  # finite source exhausted
        except BaseException as e:  # surface loader/upload errors to consumer
            self._put(e)

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def __iter__(self):
        return self

    def __next__(self):
        if getattr(self, "_exc", None) is not None:
            raise self._exc
        item = self._q.get()
        if isinstance(item, BaseException):
            self._exc = item
            raise item
        return item

    def close(self):
        """Release the worker (it exits at its next queue interaction)."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
