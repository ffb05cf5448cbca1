from . import synthetic
from .datasets import BATCH_KEYS, ClipDataset, DataSplits, empty_dataset

__all__ = [
    "synthetic",
    "ClipDataset",
    "DataSplits",
    "empty_dataset",
    "BATCH_KEYS",
]
