"""Native C++ data pipeline (csrc/nf_dataloader.cpp + normflows_tpu.data).

Checks: native library builds; native and numpy fallback agree on the
deterministic parts; transform semantics match the jnp preprocessing stack
(reference utils/preprocessing.py:4-57); shuffling is a permutation and
epoch-dependent; prefetch_to_device round-trips batches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from normflows_tpu.data import (
    NativeImageLoader,
    native_available,
    prefetch_to_device,
)
from normflows_tpu.utils import preprocessing


def make_dataset(n=64, shape=(3, 4, 4), seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, size=(n, *shape), dtype=np.uint8)
    labels = rng.integers(0, 10, size=(n,), dtype=np.int64)
    return images, labels


def test_native_builds():
    assert native_available(), "C++ loader failed to build (g++ is baked in)"


def test_no_shuffle_no_jitter_matches_jnp_preprocessing():
    """With the stochastic pieces off, the native transform must equal the
    Scale+Logit jnp pipeline exactly (same math as reference utils/
    preprocessing.py:4-57)."""
    images, labels = make_dataset(n=32)
    loader = NativeImageLoader(images, labels, batch_size=8, shuffle=False,
                               jitter=False, alpha=0.05, num_workers=2)
    assert loader.is_native
    x, y, epoch = next(loader)
    assert epoch == 0 and x.shape == (8, 3, 4, 4) and x.dtype == np.float32
    np.testing.assert_array_equal(y, labels[:8])

    # host-side f64 dequant first (matches the native loader's math and
    # avoids the jnp x64-truncation warning), then the jnp Logit
    ref = preprocessing.Logit(alpha=0.05)(
        jnp.asarray(np.asarray(images[:8], np.float64) / 255.0 * (255.0 / 256.0))
    )
    np.testing.assert_allclose(x, np.asarray(ref, np.float32), rtol=1e-6,
                               atol=1e-6)
    loader.close()


def test_jitter_bounds_and_determinism():
    images, _ = make_dataset(n=32)
    def collect(workers):
        loader = NativeImageLoader(images, None, batch_size=8, shuffle=True,
                                   jitter=True, logit=False, seed=7,
                                   num_workers=workers)
        out = [next(loader)[0] for _ in range(8)]  # two epochs
        loader.close()
        return out

    a, b = collect(1), collect(4)
    # deterministic in seed regardless of thread count
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
    # jittered values live in [0, 255/256 + 1/256] = [0, 1); float32
    # rounding of values just under 1.0 can land exactly on 1.0
    assert all(float(x.min()) >= 0.0 and float(x.max()) <= 1.0 for x in a)


def test_shuffle_is_epoch_permutation():
    images, labels = make_dataset(n=24, shape=(2,))
    loader = NativeImageLoader(images, labels, batch_size=8, shuffle=True,
                               jitter=False, logit=False, scale=1.0, seed=3,
                               num_workers=2)
    assert loader.batches_per_epoch == 3
    epochs = {}
    for _ in range(6):
        x, y, e = next(loader)
        epochs.setdefault(e, []).append(np.asarray(y))
    loader.close()
    seen0 = np.sort(np.concatenate(epochs[0]))
    seen1 = np.sort(np.concatenate(epochs[1]))
    np.testing.assert_array_equal(seen0, np.sort(labels))
    np.testing.assert_array_equal(seen1, np.sort(labels))
    # different order across epochs (overwhelmingly likely for n=24)
    assert not np.array_equal(np.concatenate(epochs[0]),
                              np.concatenate(epochs[1]))


def test_numpy_fallback_same_contract():
    images, labels = make_dataset(n=16)
    loader = NativeImageLoader(images, labels, batch_size=4, shuffle=False,
                               jitter=False, force_numpy=True)
    assert not loader.is_native
    x, y, e = next(loader)
    assert x.shape == (4, 3, 4, 4) and e == 0
    np.testing.assert_array_equal(y, labels[:4])
    ref = preprocessing.Logit(alpha=0.05)(
        jnp.asarray(np.asarray(images[:4], np.float64) / 255.0 * (255.0 / 256.0))
    )
    np.testing.assert_allclose(x, np.asarray(ref, np.float32), rtol=1e-6,
                               atol=1e-6)


def test_prefetch_to_device():
    images, labels = make_dataset(n=32)
    loader = NativeImageLoader(images, labels, batch_size=8, shuffle=False,
                               jitter=False, num_workers=2)
    stream = prefetch_to_device(loader, size=2)
    x, y, e = next(stream)
    assert isinstance(x, jax.Array) and x.shape == (8, 3, 4, 4)
    assert isinstance(y, jax.Array) and int(y[0]) == int(labels[0])
    x2, _, _ = next(stream)
    assert not np.array_equal(np.asarray(x), np.asarray(x2))
    loader.close()


def test_prefetch_with_sharding():
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data", None, None, None)
    )
    images, labels = make_dataset(n=32)
    loader = NativeImageLoader(images, labels, batch_size=8, shuffle=False,
                               jitter=False, num_workers=2)
    stream = prefetch_to_device(loader, size=2, sharding=sharding)
    x, y, _ = next(stream)
    assert x.sharding.is_equivalent_to(sharding, x.ndim)
    assert len(y.sharding.device_set) == 4
    loader.close()
