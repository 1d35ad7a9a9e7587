"""Data layer: file codecs (tiff/czi), index arithmetic, the four dataset
types, and the double-buffered host->HBM input pipeline.
"""

from .datasets import (
    ImageDataset,
    SlidingDataset,
    PairedImageDataset,
    PairedSlidingDataset,
    preprocess_dataset,
)

__all__ = [
    "ImageDataset",
    "SlidingDataset",
    "PairedImageDataset",
    "PairedSlidingDataset",
    "preprocess_dataset",
]
