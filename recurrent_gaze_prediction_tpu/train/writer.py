"""Metric/observability writer.

Replaces the reference's TensorBoard `FileWriter` + scalar/image summaries
(`/root/reference/models/base.py:115`, `models/gaze_rnn.py:162-208`,
`base.py:362-386`): scalars always go to a JSONL stream (machine-readable,
no deps); TensorBoard event files are written too when the optional
`torch.utils.tensorboard` backend imports. Image summaries (input frame /
gt map / raw pred / normalized pred) mirror the reference's validation-time
dumps.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from ..utils import log, mkdir_p


class MetricWriter:
    def __init__(self, train_dir: str, use_tensorboard: bool = True):
        self.train_dir = train_dir
        mkdir_p(train_dir)
        self._jsonl = open(os.path.join(train_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=train_dir)
            except Exception as e:  # tensorboard is optional
                log.warn("tensorboard writer unavailable: %s", e)

    def scalars(self, step: int, values: dict) -> None:
        record = {"step": int(step), "time": time.time(),
                  **{k: float(v) for k, v in values.items()}}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for key, value in values.items():
                self._tb.add_scalar(key, float(value), int(step))

    def images(self, step: int, tag: str, maps: np.ndarray,
               max_outputs: int = 2) -> None:
        """[N, H, W] or [N, H, W, C] image summaries (reference
        `_add_image_summary`, max_outputs=2, `gaze_rnn.py:172-173`)."""
        maps = np.asarray(maps)[:max_outputs]
        if self._tb is not None:
            for i, img in enumerate(maps):
                if img.ndim == 2:
                    img = img[None, :, :]  # CHW grayscale
                else:
                    img = np.transpose(img, (2, 0, 1))
                lo, hi = img.min(), img.max()
                if hi > lo:
                    img = (img - lo) / (hi - lo)
                self._tb.add_image(f"{tag}/{i}", img.astype(np.float32),
                                   int(step))

    def __call__(self, step: int, values: dict) -> None:
        self.scalars(step, values)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
