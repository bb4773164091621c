"""Host datasets + prefetching loaders."""

from pointreggpt_tpu.data.datasets import (
    DepthDataset,
    PairedDepthDataset,
    PrefetchLoader,
    TestDataset,
    collate,
)

__all__ = [
    "DepthDataset",
    "PairedDepthDataset",
    "TestDataset",
    "PrefetchLoader",
    "collate",
]
