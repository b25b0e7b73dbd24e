"""Dataloader-side preprocessing (reference: normflows/utils/preprocessing.py).

Pure functions / callable classes over arrays; ``Jitter`` takes an explicit
PRNG key (replacing torch.rand_like's global RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Logit:
    """logit(alpha + (1 - alpha) * x) (preprocessing.py:4-27)."""

    def __init__(self, alpha: float = 0.0):
        self.alpha = alpha

    def __call__(self, x):
        x_ = self.alpha + (1 - self.alpha) * x
        return jnp.log(x_ / (1 - x_))

    def inverse(self, x):
        return (jax.nn.sigmoid(x) - self.alpha) / (1 - self.alpha)


class Jitter:
    """Add uniform dequantization noise (preprocessing.py:30-44)."""

    def __init__(self, scale: float = 1.0 / 256):
        self.scale = scale

    def __call__(self, x, key):
        return x + jax.random.uniform(key, x.shape, dtype=x.dtype) * self.scale


class Scale:
    """Multiply by a constant, e.g. 255/256 (preprocessing.py:47-57)."""

    def __init__(self, scale: float = 255.0 / 256.0):
        self.scale = scale

    def __call__(self, x):
        return x * self.scale
