from . import codec, crc, gazemap, salicon, seq, synthetic
from .crc import DatasetLayout, read_crc_data_sets, split_foldernames
from .datasets import BATCH_KEYS, ClipDataset, DataSplits, empty_dataset
from .seq import SEQ_LEN, seq2batch

__all__ = [
    "synthetic",
    "codec",
    "crc",
    "gazemap",
    "salicon",
    "seq",
    "ClipDataset",
    "DataSplits",
    "empty_dataset",
    "BATCH_KEYS",
    "DatasetLayout",
    "read_crc_data_sets",
    "split_foldernames",
    "SEQ_LEN",
    "seq2batch",
]
