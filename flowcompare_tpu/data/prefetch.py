"""Host-side batch prefetching.

Counterpart of the reference's DataLoader(num_workers=4, pin_memory,
prefetch_factor=2) host parallelism (train.py:41-42): a thread pool builds
batches ahead of the training loop so FPS/normalization overlaps device
compute. Threads (not processes) suffice — the heavy lifting is numpy
releasing the GIL, and the device step dominates.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class PrefetchIterator:
    def __init__(self, iterable: Iterable, prefetch: int = 2):
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._sentinel = object()
        self._err = None

        def worker():
            try:
                for item in iterable:
                    self._queue.put(item)
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._queue.put(self._sentinel)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._sentinel:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class PrefetchedDataset:
    """Wrap a re-iterable batch source with background prefetching."""

    def __init__(self, source: Iterable, prefetch: int = 2):
        self.source = source
        self.prefetch = prefetch

    def __iter__(self):
        return PrefetchIterator(iter(self.source), self.prefetch)

    def __len__(self):
        return len(self.source)
