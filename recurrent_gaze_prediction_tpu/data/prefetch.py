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


def device_put_batch(batch: dict, sharding=None,
                     cast: Optional[dict] = None) -> dict:
    """`cast` maps batch keys to dtypes applied HOST-side before transfer.

    This matters on transfer-bound hosts: a [16, 16, 1024, 7, 7] fp32 C3D
    batch is 822 MB per step; casting to bf16 on host halves the wire
    bytes (measured: input transfer, not compute, dominates the train step
    when feeding precomputed features — see BENCHMARKS.md). The models
    cast to their compute dtype anyway.
    """
    out = {}
    for key, value in batch.items():
        if key == "clipnames":
            continue
        arr = np.asarray(value)
        if cast and key in cast:
            arr = arr.astype(cast[key])
        out[key] = (jax.device_put(arr, sharding) if sharding is not None
                    else jax.device_put(arr))
    return out


def prefetch_batches(dataset: ClipDataset, batch_size: int, *,
                     sharding=None, buffer_size: int = 2,
                     cast: Optional[dict] = None,
                     max_batches: Optional[int] = None) -> Iterator[dict]:
    """Yield device-resident batches, produced ahead of time by a worker
    thread. device_put is async, so the transfer of batch k+1 overlaps the
    compute of batch k."""
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    stop = threading.Event()

    def put_or_abandon(item) -> bool:
        """Blocking put that gives up once the consumer has left.

        A bare q.put can block FOREVER when the consumer abandons the
        generator early (break mid-sweep): the final sentinel put then
        pins this thread plus a device-resident batch for the life of
        the process. Poll `stop` instead of blocking indefinitely."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        produced = 0
        try:
            while not stop.is_set():
                if max_batches is not None and produced >= max_batches:
                    break
                batch = dataset.next_batch(batch_size)
                if not put_or_abandon(
                        device_put_batch(batch, sharding, cast=cast)):
                    return
                produced += 1
            put_or_abandon(None)
        except BaseException as exc:  # surface in the consumer; a dead
            # worker with no sentinel would leave q.get() blocked forever
            put_or_abandon(exc)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # drain so the worker can exit
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
