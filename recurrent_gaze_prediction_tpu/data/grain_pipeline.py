"""Grain-based host input pipeline.

The reference feeds batches synchronously through feed_dict from in-RAM
object arrays (`/root/reference/models/gaze_rnn.py:523-531`); SURVEY.md
section 7 maps this to a grain/tf.data-style host pipeline. This module
wraps a `ClipDataset` (or any record source) into a `grain.DataLoader`
with deterministic global shuffling, sharding across hosts, worker
processes, and checkpointable iteration state — the production input path
for multi-epoch training.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .datasets import BATCH_KEYS, ClipDataset


class _ClipSource:
    """Random-access view over a ClipDataset (grain RandomAccessDataSource
    protocol: __len__ + __getitem__)."""

    def __init__(self, dataset: ClipDataset):
        self._data = dataset

    def __len__(self) -> int:
        return len(self._data)

    def __getitem__(self, index: int) -> dict:
        record = {key: getattr(self._data, key)[index]
                  for key in BATCH_KEYS}
        return record


def make_dataloader(dataset: ClipDataset, batch_size: int, *,
                    seed: int = 0, shuffle: bool = True,
                    num_epochs: Optional[int] = None,
                    worker_count: int = 0,
                    shard_index: Optional[int] = None,
                    shard_count: Optional[int] = None):
    """Build a grain DataLoader over clip windows.

    worker_count > 0 moves record assembly into subprocesses (the
    replacement for the reference's joblib loading pool); shard_index/
    shard_count slice the dataset per host for multi-host training.
    """
    import grain.python as gp

    if shard_index is None or shard_count is None:
        sharding = gp.NoSharding()
    else:
        sharding = gp.ShardOptions(shard_index=shard_index,
                                   shard_count=shard_count,
                                   drop_remainder=True)

    sampler = gp.IndexSampler(
        num_records=len(dataset),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=sharding,
    )
    return gp.DataLoader(
        data_source=_ClipSource(dataset),
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=worker_count,
    )


def iterate_batches(loader) -> "iter":
    """Yield dict batches with contiguous float32 arrays."""
    for batch in loader:
        yield {k: np.ascontiguousarray(v) for k, v in batch.items()}
