"""ctypes binding + Python API for the native C++ data pipeline.

The shared library (``csrc/nf_dataloader.cpp``) is compiled on first use
with ``g++ -O3 -shared`` and cached by source hash; if no compiler is
available the loader falls back to an equivalent (slower, single-threaded)
numpy implementation so behavior is identical everywhere.

Transform semantics match the reference dataloader stack
(reference utils/preprocessing.py:4-57): ``x -> x/255 * scale + U(0,1/256)``
then ``logit(alpha + (1-alpha) x)`` — the Glow/image dequantization pipeline
(reference examples/glow.ipynb data cells).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "nf_dataloader.cpp")
_LOCK = threading.Lock()
_LIB = None
_LIB_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    """Compile (cached by source hash) and load the shared library."""
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "NF_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "normflows_tpu"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"nf_dataloader_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
               src, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, so_path)
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            return None
    lib = ctypes.CDLL(so_path)
    lib.nf_loader_create.restype = ctypes.c_void_p
    lib.nf_loader_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_int,
    ]
    lib.nf_loader_next.restype = ctypes.c_int64
    lib.nf_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_void_p]
    lib.nf_loader_batches_per_epoch.restype = ctypes.c_int64
    lib.nf_loader_batches_per_epoch.argtypes = [ctypes.c_void_p]
    lib.nf_loader_destroy.restype = None
    lib.nf_loader_destroy.argtypes = [ctypes.c_void_p]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    with _LOCK:
        if not _LIB_TRIED:
            _LIB_TRIED = True
            _LIB = _build_lib()
        return _LIB


def native_available() -> bool:
    """True if the C++ pipeline compiled and loaded in this environment."""
    return _get_lib() is not None


class NativeImageLoader:
    """Multithreaded image-batch pipeline over an in-memory uint8 dataset.

    Parameters mirror the reference's DataLoader + transform stack:

    Args:
        images: uint8 array ``(n, ...)`` (e.g. ``(n, C, H, W)``).
        labels: optional int64 array ``(n,)``.
        batch_size: items per batch.
        shuffle: per-epoch Fisher-Yates shuffle (deterministic in ``seed``).
        seed: RNG seed; batches are bit-identical for a given
            (seed, epoch, batch index) regardless of thread count.
        num_workers: producer threads (native path only).
        scale / jitter / logit / alpha: the dequantization transform
            ``logit(alpha + (1-alpha) * (u8/255 * scale + U(0,1/256)))``;
            disable pieces to get raw normalized batches.
        prefetch: bounded queue depth of pre-transformed batches.

    Iterating yields ``(x, y, epoch)`` with ``x`` float32 ``(batch, ...)``
    and ``y`` int64 or None — an infinite stream over reshuffled epochs
    (take ``batches_per_epoch`` steps for one epoch).
    """

    def __init__(self, images: np.ndarray, labels: Optional[np.ndarray] = None,
                 batch_size: int = 128, *, shuffle: bool = True, seed: int = 0,
                 num_workers: int = 4, scale: float = 255.0 / 256.0,
                 jitter: bool = True, logit: bool = True, alpha: float = 0.05,
                 prefetch: int = 4, force_numpy: bool = False):
        images = np.ascontiguousarray(images, dtype=np.uint8)
        if labels is not None:
            labels = np.ascontiguousarray(labels, dtype=np.int64)
            if labels.shape[0] != images.shape[0]:
                raise ValueError("labels/images length mismatch")
        if images.shape[0] < batch_size:
            raise ValueError("dataset smaller than one batch")
        self._images = images  # keep alive: native side borrows the buffer
        self._labels = labels
        self.item_shape = images.shape[1:]
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.shuffle = bool(shuffle)
        self.scale = float(scale)
        self.jitter = bool(jitter)
        self.logit = bool(logit)
        self.alpha = float(alpha)
        self.batches_per_epoch = images.shape[0] // self.batch_size
        self._item_elems = int(np.prod(self.item_shape))
        self._handle = None
        self._lib = None if force_numpy else _get_lib()
        if self._lib is not None:
            self._handle = self._lib.nf_loader_create(
                images.ctypes.data_as(ctypes.c_void_p),
                labels.ctypes.data_as(ctypes.c_void_p) if labels is not None
                else None,
                images.shape[0], self._item_elems, self.batch_size,
                self.seed, int(num_workers), int(self.shuffle), 1,
                self.scale, int(self.jitter), int(self.logit), self.alpha,
                int(prefetch),
            )
            if not self._handle:
                self._lib = None
        self._np_ticket = 0  # fallback path position

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    # ---------------------------------------------------------- numpy path
    def _np_batch(self, ticket: int):
        epoch, bidx = divmod(ticket, self.batches_per_epoch)
        rng = np.random.default_rng((self.seed, epoch, 0xA5A5A5A5))
        perm = (rng.permutation(self._images.shape[0]) if self.shuffle
                else np.arange(self._images.shape[0]))
        rows = perm[bidx * self.batch_size:(bidx + 1) * self.batch_size]
        x = self._images[rows].astype(np.float64) / 255.0 * self.scale
        if self.jitter:
            jrng = np.random.default_rng((self.seed, epoch, bidx + 17))
            x = x + jrng.random(x.shape) / 256.0
        if self.logit:
            xp = self.alpha + (1.0 - self.alpha) * x
            x = np.log(xp / (1.0 - xp))
        y = self._labels[rows] if self._labels is not None else None
        return x.astype(np.float32), y, epoch

    # ---------------------------------------------------------- native path
    def _native_batch(self):
        x = np.empty((self.batch_size, *self.item_shape), dtype=np.float32)
        y = (np.empty((self.batch_size,), dtype=np.int64)
             if self._labels is not None else None)
        epoch = ctypes.c_int64(0)
        count = self._lib.nf_loader_next(
            self._handle, x.ctypes.data_as(ctypes.c_void_p),
            y.ctypes.data_as(ctypes.c_void_p) if y is not None else None,
            ctypes.byref(epoch))
        if count < 0:
            raise StopIteration
        return x, y, int(epoch.value)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray], int]]:
        return self

    def __next__(self):
        if self._handle is not None:
            return self._native_batch()
        out = self._np_batch(self._np_ticket)
        self._np_ticket += 1
        return out

    def close(self):
        if self._handle is not None:
            self._lib.nf_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Overlap host batch production with device transfer.

    Wraps any host-batch iterator (e.g. :class:`NativeImageLoader`) and keeps
    ``size`` batches already transferred (``jax.device_put`` is async), so
    the training step never waits on HBM ingress.  ``sharding`` places each
    batch directly into a distributed layout (e.g. batch-sharded
    ``NamedSharding``) for multi-chip training.
    """
    import collections
    import jax

    queue = collections.deque()

    def _put(batch):
        x, y, epoch = batch
        x = jax.device_put(x, sharding)
        if y is not None:
            # labels are 1-D; shard along the batch axis of `sharding` if
            # one was given, else default placement
            y_sharding = None
            if sharding is not None and hasattr(sharding, "spec"):
                import jax.sharding as jsh

                y_sharding = jsh.NamedSharding(
                    sharding.mesh, jsh.PartitionSpec(sharding.spec[0])
                )
            y = jax.device_put(y, y_sharding)
        return x, y, epoch

    it = iter(iterator)
    try:
        while True:
            while len(queue) < size:
                queue.append(_put(next(it)))
            yield queue.popleft()
    except StopIteration:
        while queue:
            yield queue.popleft()
