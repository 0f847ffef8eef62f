"""Host-overlapped batch feeding: background batcher + device prefetch.

The reference feeds the GPU through torch DataLoader workers with
pin_memory (train_model.py:115-126). The TPU-native equivalent: a
background thread assembles numpy batches (shuffle each epoch, drop_last)
while a double-buffered `jax.device_put` keeps the next batch in HBM
before the step needs it, hiding host->device transfer behind compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np


class BatchLoader:
    """Epoch-shuffled numpy batch iterator with a background worker."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        queue_size: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.queue_size = queue_size
        n = len(dataset)
        self.steps_per_epoch = n // batch_size if drop_last else -(-n // batch_size)
        if self.steps_per_epoch == 0:
            raise ValueError(
                f"dataset of {n} samples too small for batch_size={batch_size}"
            )

    def epoch(self, epoch_idx: int) -> Iterator[dict]:
        """Yield {'image', 'text'} numpy batches for one epoch."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch_idx)
            rng.shuffle(order)

        q: queue.Queue = queue.Queue(maxsize=self.queue_size)
        stop = threading.Event()

        from moegan_tpu.data import native

        def worker():
            try:
                for s in range(self.steps_per_epoch):
                    if stop.is_set():
                        return
                    idx = order[s * self.batch_size : (s + 1) * self.batch_size]
                    # Native multithreaded gather (C++ thread pool, GIL-free)
                    # with a numpy fallback.
                    imgs = native.gather_rows(self.dataset.images, idx)
                    txts = native.gather_rows(self.dataset.text_embeddings, idx)
                    q.put({"image": imgs, "text": txts})
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def prefetch_to_device(iterator, *, size: int = 2, sharding=None):
    """Double-buffer: device_put the next batch while the current computes.

    With ``sharding`` (e.g. NamedSharding over the data axis) the put also
    distributes the batch across the mesh.
    """
    buf = []

    def put(x):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sharding(a) if callable(sharding) else sharding),
                x,
            )
        return jax.tree_util.tree_map(jax.device_put, x)

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
