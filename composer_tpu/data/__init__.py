"""Dataset preprocessing, loading, and record export/import."""

from composer_tpu.data.loader import WindowDataset, load_dataset, load_event_ids
from composer_tpu.data.preprocess import (
    convert_all,
    convert_file,
    get_processed_files,
    split_dataset,
)

__all__ = [
    "WindowDataset",
    "convert_all",
    "convert_file",
    "get_processed_files",
    "load_dataset",
    "load_event_ids",
    "split_dataset",
]
