"""Binary feature masks (reference: normflows/utils/masks.py:4-57)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def create_alternating_binary_mask(features: int, even: bool = True):
    """1 at even (or odd) positions (masks.py:4-21)."""
    idx = jnp.arange(features)
    mask = (idx % 2 == 0) if even else (idx % 2 == 1)
    return mask.astype(jnp.float32)


def create_mid_split_binary_mask(features: int):
    """1 on the first half (ceil) of features (masks.py:24-39)."""
    midpoint = features // 2 if features % 2 == 0 else features // 2 + 1
    mask = jnp.arange(features) < midpoint
    return mask.astype(jnp.float32)


def create_random_binary_mask(features: int, key=None, seed: int = 0):
    """Exactly-half random binary mask (masks.py:42-57)."""
    if key is None:
        key = jax.random.key(seed)
    midpoint = features // 2 if features % 2 == 0 else features // 2 + 1
    perm = jax.random.permutation(key, features)
    mask = jnp.zeros(features).at[perm[:midpoint]].set(1.0)
    return mask
