"""Host-side data pipeline: parquet reader + paired image transforms.

Replaces the reference's ``datasets.load_dataset("parquet") + with_transform``
stack (train_gm_unet.py:908-992) with a pyarrow reader and a threaded
prefetcher feeding device-ready numpy batches.
"""

from gmdx.data.parquet import ParquetImageDataset, make_dataloader
from gmdx.data.prefetch import device_prefetch
from gmdx.data.transforms import (
    resize_shorter_side,
    paired_crop,
    to_model_range,
    preprocess_pair,
)

__all__ = [
    "ParquetImageDataset",
    "make_dataloader",
    "device_prefetch",
    "resize_shorter_side",
    "paired_crop",
    "to_model_range",
    "preprocess_pair",
]
