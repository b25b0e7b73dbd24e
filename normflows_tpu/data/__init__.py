"""Data-loading runtime: native (C++) pipeline + device prefetching.

Replaces the reference's torch ``DataLoader`` + Python-side transform stack
(reference utils/preprocessing.py:4-57, examples/glow.ipynb data cells) with
a TPU-native pipeline: multithreaded C++ batch production (shuffle,
dequantization jitter, logit) overlapped with asynchronous device transfer.
"""

from .native_loader import (
    NativeImageLoader,
    native_available,
    prefetch_to_device,
)

__all__ = ["NativeImageLoader", "native_available", "prefetch_to_device"]
