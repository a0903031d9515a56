"""Bucketed data loader with background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(datasets/__init__.py:16-34): worker threads parse cases and collate
static-shape numpy batches; a bounded queue overlaps host-side I/O with the
device step. For multi-host training each process takes a contiguous block
of every global batch (``shard=(process_index, process_count)``) — same
coverage as the DistributedSampler contract, but the concatenation of the
process shards reproduces the single-process batch order exactly (see
``_index_stream``).
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Iterator, Optional, Tuple


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 2,
        drop_last: bool = True,
        seed: int = 1234,
        shard: Optional[Tuple[int, int]] = None,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.shard = shard or (0, 1)
        self.prefetch = prefetch
        self.epoch = 0

    def _index_stream(self) -> Iterator[list]:
        """Contiguous-block sharding: every global step consumes one
        world*batch_size slice of the (seed-synchronized) permutation and
        rank r takes rows [r*B, (r+1)*B). Unlike the DistributedSampler's
        strided split, the global device array (process shards concatenate
        in rank order) then has exactly the single-process row order, so a
        multi-host run is bit-identical to a single-host run with the same
        global batch (per-row RNG like window starts pairs identically)."""
        rank, world = self.shard
        n = len(self.dataset)
        gb = self.batch_size * world
        while True:
            indices = list(range(n))
            if self.shuffle:
                random.Random(self.seed + self.epoch).shuffle(indices)
            for i in range(0, len(indices), gb):
                chunk = indices[i : i + gb]
                if len(chunk) < gb:
                    if self.drop_last:
                        break
                    chunk = chunk + indices[: gb - len(chunk)]
                yield chunk[rank * self.batch_size : (rank + 1) * self.batch_size]
            self.epoch += 1

    def _make_batch(self, idx_chunk):
        if hasattr(self.dataset, "parse_cases"):
            # one GIL-released native C++ thread-pool read per batch
            # (data/native.py read_batch)
            cases = self.dataset.parse_cases(idx_chunk)
        else:
            cases = [self.dataset[i] for i in idx_chunk]
        return self.dataset.collate_fn(cases)

    def __iter__(self):
        if self.num_workers == 0:
            for chunk in self._index_stream():
                yield self._make_batch(chunk)
            return

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        idx_q: queue.Queue = queue.Queue(maxsize=self.prefetch * 2)
        stop = threading.Event()
        stream = self._index_stream()

        def feeder():
            seq = 0
            for chunk in stream:
                if stop.is_set():
                    return
                idx_q.put((seq, chunk))
                seq += 1

        def worker():
            while not stop.is_set():
                try:
                    seq, chunk = idx_q.get(timeout=0.5)
                except queue.Empty:
                    continue
                try:
                    out_q.put((seq, self._make_batch(chunk)))
                except Exception as e:  # surface loader errors to the consumer
                    out_q.put((seq, e))

        threads = [threading.Thread(target=feeder, daemon=True)]
        threads += [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        # re-order by sequence id so runs are deterministic given a seed
        pending = {}
        next_seq = 0
        try:
            while True:
                while next_seq not in pending:
                    seq, item = out_q.get()
                    pending[seq] = item
                item = pending.pop(next_seq)
                next_seq += 1
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def finite_loader(dataset, batch_size: int = 1):
    """Sequential single-pass loader for inference (infer.py uses an
    unshuffled DataLoader over the test set)."""
    n = len(dataset)
    for i in range(0, n, batch_size):
        cases = [dataset[j] for j in range(i, min(n, i + batch_size))]
        yield dataset.collate_fn(cases)
