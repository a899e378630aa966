"""Threaded double-buffered batch prefetcher.

TPU-feedable ingest path replacing the reference's torch DataLoader worker
processes doing OpenCV decode inside ``__getitem__``
(/root/reference/datasets/MFDataset.py:59-97).  Video/jpeg decode is
native (OpenCV/ffmpeg) and releases the GIL, so a small thread pool
saturates host decode while the device computes; ``depth`` batches are kept
in flight (double buffering by default).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")
_SENTINEL = object()


class Prefetcher:
    def __init__(self, iterable: Iterable[T], depth: int = 2,
                 transform: Optional[Callable] = None):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._transform = transform
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(iter(iterable),), daemon=True
        )
        self._thread.start()

    def _worker(self, it: Iterator[T]):
        try:
            for item in it:
                if self._transform is not None:
                    item = self._transform(item)
                self._q.put(item)
        except BaseException as e:  # propagate to consumer
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(iterable: Iterable[T], depth: int = 2,
             transform: Optional[Callable] = None) -> Prefetcher:
    return Prefetcher(iterable, depth=depth, transform=transform)
