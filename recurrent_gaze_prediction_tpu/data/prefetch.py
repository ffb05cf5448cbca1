"""Host->device input prefetching.

The reference feeds every batch through `feed_dict` synchronously
(`/root/reference/models/gaze_rnn.py:523-531`). Here a background thread
keeps a small queue of device-resident batches ahead of the train loop, so
host batching/augment prep overlaps device compute — the TPU equivalent of
an async input pipeline.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np

from .datasets import ClipDataset


def device_put_batch(batch: dict, sharding=None) -> dict:
    out = {}
    for key, value in batch.items():
        if key == "clipnames":
            continue
        arr = np.asarray(value)
        out[key] = (jax.device_put(arr, sharding) if sharding is not None
                    else jax.device_put(arr))
    return out


def prefetch_batches(dataset: ClipDataset, batch_size: int, *,
                     sharding=None, buffer_size: int = 2,
                     max_batches: Optional[int] = None) -> Iterator[dict]:
    """Yield device-resident batches, produced ahead of time by a worker
    thread. device_put is async, so the transfer of batch k+1 overlaps the
    compute of batch k."""
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    stop = threading.Event()

    def worker():
        produced = 0
        while not stop.is_set():
            if max_batches is not None and produced >= max_batches:
                break
            batch = dataset.next_batch(batch_size)
            q.put(device_put_batch(batch, sharding))
            produced += 1
        q.put(None)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            yield item
    finally:
        stop.set()
        # drain so the worker can exit
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
