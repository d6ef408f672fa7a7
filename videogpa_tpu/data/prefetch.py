"""Host->device input pipeline with double-buffered prefetch.

TPU-native replacement for the reference's DataLoader(num_workers=4,
pin_memory=True) feeding (reference ``train/CogVideoX-I2V-5B/03_train.py:243``):
a background thread pool decodes/loads the next batches while the device
computes, and ``jax.device_put`` overlaps the H2D copy with the current step.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax


def prefetch_to_device(
    iterator: Iterable[Any],
    buffer_size: int = 2,
    sharding: Optional[Any] = None,
) -> Iterator[Any]:
    """Wrap a host batch iterator with async device transfer.

    Args:
        iterator: yields pytrees of numpy arrays.
        buffer_size: number of batches staged ahead (2 = double buffering).
        sharding: optional jax.sharding.Sharding applied on transfer.

    Yields:
        pytrees of device arrays.
    """

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    sentinel = object()
    err: list = []

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


class BatchLoader:
    """Threaded map-style loader: indices -> collated host batches."""

    def __init__(
        self,
        dataset,
        indices,
        batch_size: int,
        collate: Callable,
        num_workers: int = 4,
        shuffle_seed: Optional[int] = None,
    ):
        self.dataset = dataset
        self.indices = list(indices)
        self.batch_size = batch_size
        self.collate = collate
        self.num_workers = max(1, num_workers)
        self.shuffle_seed = shuffle_seed
        self._epoch = 0

    def __len__(self):
        return len(self.indices) // self.batch_size

    def __iter__(self):
        import concurrent.futures as cf

        import numpy as np

        order = list(self.indices)
        if self.shuffle_seed is not None:
            rng = np.random.default_rng(self.shuffle_seed + self._epoch)
            order = list(rng.permutation(order))
        self._epoch += 1

        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order) - self.batch_size + 1, self.batch_size)
        ]

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            def load(idxs):
                return self.collate([self.dataset[int(i)] for i in idxs])

            futures = [pool.submit(load, b) for b in batches]
            for fut in futures:
                yield fut.result()
