"""Minimal high-throughput batch loader with background prefetch.

The reference wraps torch DataLoader with worker processes
(train_vqvae.py:45-51).  Here a thread pool decodes/collates numpy batches
while the accelerator runs, and batches are handed to JAX as stacked numpy
arrays (device transfer happens inside the jitted step).  Threads suffice
because PIL decode + resize release the GIL for the heavy parts.
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def prefetch_to_device(
    iterator, put: Callable[[Any], Any], depth: int = 2
) -> Iterator[Any]:
    """Stage up to ``depth - 1`` batches on device ahead of the one being
    consumed (``depth`` batches are placed in total, including the yielded
    one).

    ``put`` issues the host->device transfer (``jax.device_put`` /
    ``jnp.asarray`` dispatch asynchronously), so batch N+1's transfer rides
    under batch N's device compute instead of serializing after it — the
    standard TPU input pipeline shape.  ``depth`` bounds device memory spent
    on staged input buffers.
    """
    buf: deque = deque()
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def collate(samples: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack numpy leaves; keep strings as lists."""
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str):
            out[key] = vals
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 4,
        shuffle: bool = False,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        batches = []
        for i in range(0, n, self.batch_size):
            chunk = order[i : i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                break
            batches.append(chunk)
        return batches

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        batches = self._batch_indices()
        self.epoch += 1
        if not batches:
            return

        def load(idx_batch):
            return collate([self.dataset[int(i)] for i in idx_batch])

        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = []
            it = iter(batches)
            for _ in range(min(self.prefetch + 1, len(batches))):
                pending.append(pool.submit(load, next(it)))
            for idx_batch in it:
                done = pending.pop(0)
                pending.append(pool.submit(load, idx_batch))
                yield done.result()
            for fut in pending:
                yield fut.result()
