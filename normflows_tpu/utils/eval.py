"""Evaluation helpers (reference: normflows/utils/eval.py:5-63)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def bits_per_dim(model, x, y=None, trans: str = "logit", trans_param=(0.05,)):
    """Bits/dim with logit-transform correction (+8 for 256 levels, eval.py:26-29)."""
    dims = float(np.prod(x.shape[1:]))
    if trans != "logit":
        raise NotImplementedError(f"The transformation {trans} is not implemented.")
    log_q = model.log_prob(x) if y is None else model.log_prob(x, y)
    axes = tuple(range(1, x.ndim))
    sig_ = jnp.sum(jax.nn.log_sigmoid(x) / np.log(2), axis=axes)
    sig_ = sig_ + jnp.sum(jax.nn.log_sigmoid(-x) / np.log(2), axis=axes)
    b = -log_q / dims / np.log(2) - np.log2(1 - trans_param[0]) + 8
    return b + sig_ / dims


# reference-compatible alias
bitsPerDim = bits_per_dim


def bits_per_dim_dataset(model, data_iter, class_cond: bool = True,
                         trans: str = "logit", trans_param=(0.05,)):
    """Dataset-mean bits/dim with NaN skipping (eval.py:37-63).

    ``data_iter`` yields (x, y) batches as arrays.
    """
    n = 0
    b_cum = 0.0
    for x, y in data_iter:
        b = bits_per_dim(model, x, y if class_cond else None, trans, trans_param)
        b_np = np.asarray(b)
        b_cum += np.nansum(b_np)
        n += len(x) - int(np.sum(np.isnan(b_np)))
    return b_cum / n


bitsPerDimDataset = bits_per_dim_dataset
