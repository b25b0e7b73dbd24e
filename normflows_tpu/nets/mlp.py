"""MLP parameter network (reference: normflows/nets/mlp.py:5-58).

TPU-first notes: Linear layers carry an explicit ``dtype`` for bf16 matmul on
the MXU while keeping parameters in f32; the zero-init of the final layer
(Glow trick, mlp.py:37-39) is preserved because coupling identity-init is
load-bearing for training stability.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.module import Module, static_field
from ..utils.nn import ConstScaleLayer, ClampExp


class Linear(Module):
    weight: jnp.ndarray  # (in, out)
    bias: Optional[jnp.ndarray]
    compute_dtype: str = static_field(default=None)

    @classmethod
    def create(cls, key, in_dim, out_dim, bias=True, init="lecun", zeros=False,
               compute_dtype=None):
        if zeros:
            w = jnp.zeros((in_dim, out_dim))
        elif init == "lecun":
            w = jax.random.normal(key, (in_dim, out_dim)) / jnp.sqrt(in_dim)
        else:  # torch default: U(-1/sqrt(in), 1/sqrt(in))
            bound = 1.0 / jnp.sqrt(in_dim)
            w = jax.random.uniform(key, (in_dim, out_dim), minval=-bound, maxval=bound)
        b = jnp.zeros(out_dim) if bias else None
        return cls(weight=w, bias=b, compute_dtype=compute_dtype)

    def __call__(self, x):
        w = self.weight
        if self.compute_dtype is not None:
            dt = jnp.dtype(self.compute_dtype)
            y = jnp.dot(x.astype(dt), w.astype(dt), preferred_element_type=jnp.float32)
        else:
            y = jnp.dot(x, w)
        if self.bias is not None:
            y = y + self.bias
        return y.astype(x.dtype)


class MLP(Module):
    """LeakyReLU MLP with optional output function & scaling (mlp.py:5-58).

    ``layers`` alternates Linear and static activation tags, mirroring the
    reference's ``nn.Sequential``; dropout is supported at train time via an
    explicit key.
    """

    linears: tuple
    leaky: float = static_field(default=0.0)
    score_scale: Optional[float] = static_field(default=None)
    output_fn: Optional[str] = static_field(default=None)
    output_scale: Optional[float] = static_field(default=None)
    dropout_rate: Optional[float] = static_field(default=None)

    @classmethod
    def create(cls, key, layer_sizes=None, leaky=0.0, score_scale=None,
               output_fn=None, output_scale=None, init_zeros=False,
               dropout_rate=None, compute_dtype=None, layers=None,
               dropout=None):
        """``layers`` and ``dropout`` are accepted as aliases for
        ``layer_sizes`` / ``dropout_rate`` so reference call sites
        (nets/mlp.py:5-58) port verbatim."""
        if layers is not None:
            if layer_sizes is not None:
                raise TypeError("pass either layer_sizes or layers, not both")
            layer_sizes = layers
        if layer_sizes is None:
            raise TypeError("layer_sizes (or layers) is required")
        if dropout is not None:
            if dropout_rate is not None:
                raise TypeError("pass either dropout_rate or dropout, not both")
            dropout_rate = dropout
        n = len(layer_sizes) - 1
        keys = jax.random.split(key, n)
        linears = []
        for i in range(n):
            zeros = init_zeros and (i == n - 1)
            linears.append(
                Linear.create(keys[i], layer_sizes[i], layer_sizes[i + 1],
                              init="torch", zeros=zeros, compute_dtype=compute_dtype)
            )
        return cls(
            linears=tuple(linears), leaky=leaky, score_scale=score_scale,
            output_fn=output_fn, output_scale=output_scale, dropout_rate=dropout_rate,
        )

    def __call__(self, x, *, key=None, train: bool = False):
        n = len(self.linears)
        for i, lin in enumerate(self.linears):
            if i == n - 1 and self.dropout_rate is not None and train and key is not None:
                keep = 1.0 - self.dropout_rate
                mask = jax.random.bernoulli(key, keep, x.shape)
                x = jnp.where(mask, x / keep, 0.0)
            x = lin(x)
            if i < n - 1:
                x = jax.nn.leaky_relu(x, self.leaky)
        if self.output_fn is not None:
            if self.score_scale is not None:
                x = x * self.score_scale
            if self.output_fn == "sigmoid":
                x = jax.nn.sigmoid(x)
            elif self.output_fn == "relu":
                x = jax.nn.relu(x)
            elif self.output_fn == "tanh":
                x = jnp.tanh(x)
            elif self.output_fn == "clampexp":
                x = ClampExp()(x)
            else:
                raise NotImplementedError(f"output function {self.output_fn}")
            if self.output_scale is not None:
                x = x * self.output_scale
        return x
