"""Conv nets (reference: normflows/nets/cnn.py:5-63), NCHW layout.

Convolutions run through ``lax.conv_general_dilated`` with explicit NCHW/OIHW
dimension numbers; XLA lowers 3x3/1x1 convs onto the MXU.  An optional
``compute_dtype='bfloat16'`` casts activations/weights for the conv while
keeping f32 params and f32 accumulation (preferred_element_type).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module, static_field


class Conv2d(Module):
    """2-D convolution, NCHW, same-padding by kernel//2."""

    weight: jnp.ndarray  # (out, in, kh, kw)
    bias: Optional[jnp.ndarray]
    padding: int = static_field(default=0)
    compute_dtype: Optional[str] = static_field(default=None)

    @classmethod
    def create(cls, key, in_channels, out_channels, kernel_size, bias=True,
               zeros=False, weight_std=None, compute_dtype=None):
        k = kernel_size
        fan_in = in_channels * k * k
        if zeros:
            w = jnp.zeros((out_channels, in_channels, k, k))
        elif weight_std is not None:
            w = weight_std * jax.random.normal(key, (out_channels, in_channels, k, k))
        else:  # torch default init
            bound = 1.0 / np.sqrt(fan_in)
            w = jax.random.uniform(
                key, (out_channels, in_channels, k, k), minval=-bound, maxval=bound
            )
        b = jnp.zeros(out_channels) if bias else None
        return cls(weight=w, bias=b, padding=k // 2, compute_dtype=compute_dtype)

    def __call__(self, x):
        w = self.weight
        if self.compute_dtype is not None:
            # fully-bf16 conv (MXU accumulates in f32 internally); a mixed
            # f32-preferred output would break the conv transpose rule in
            # the backward pass (lax requires matching operand dtypes)
            dt = jnp.dtype(self.compute_dtype)
            x_c, w = x.astype(dt), w.astype(dt)
            y = jax.lax.conv_general_dilated(
                x_c, w, (1, 1), [(self.padding, self.padding)] * 2,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
        else:
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(self.padding, self.padding)] * 2,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32,
            )
        y = y.astype(x.dtype)
        if self.bias is not None:
            y = y + self.bias[None, :, None, None].astype(y.dtype)
        return y


class NetActNorm(Module):
    """Per-channel scale/shift used inside ConvNet2d (utils/nn.py:26-43).

    Identity-initialized; data-dependent whitening is applied by
    ``data_dep_init`` traversals when requested.
    """

    s: jnp.ndarray
    t: jnp.ndarray

    @classmethod
    def create(cls, shape):
        return cls(s=jnp.zeros((1, *shape)), t=jnp.zeros((1, *shape)))

    def __call__(self, x):
        # compute in x's dtype so an end-to-end-bf16 ConvNet2d chain is not
        # silently promoted back to f32 between convs
        return x * jnp.exp(self.s).astype(x.dtype) + self.t.astype(x.dtype)


class ConvNet2d(Module):
    """Conv stack with leaky ReLU; zero-init output conv (cnn.py:5-63)."""

    convs: tuple
    actnorms: tuple
    leaky: float = static_field(default=0.0)

    @classmethod
    def create(cls, key, channels, kernel_size, leaky=0.0, init_zeros=True,
               actnorm=False, weight_std=None, compute_dtype=None):
        n = len(kernel_size)
        keys = jax.random.split(key, n)
        convs, actnorms = [], []
        for i in range(n - 1):
            convs.append(
                Conv2d.create(
                    keys[i], channels[i], channels[i + 1], kernel_size[i],
                    bias=not actnorm, weight_std=weight_std,
                    compute_dtype=compute_dtype,
                )
            )
            actnorms.append(
                NetActNorm.create((channels[i + 1], 1, 1)) if actnorm else None
            )
        convs.append(
            Conv2d.create(
                keys[-1], channels[n - 1], channels[n], kernel_size[-1],
                zeros=init_zeros, compute_dtype=compute_dtype,
            )
        )
        return cls(convs=tuple(convs), actnorms=tuple(actnorms), leaky=leaky)

    def __call__(self, x, context=None):
        # NB: keeping activations bf16 BETWEEN the convs (single entry/exit
        # cast instead of per-conv casts) was measured SLOWER on the chip
        # (batch 128: 20.7 vs 20.0 ms; batch 512: 40.5 vs 37.6 ms,
        # 2026-08-21): XLA already fuses the per-conv casts into the
        # neighboring elementwise ops, and the bf16 activation chain
        # degraded its fusion choices — so activations stay f32 here.
        for i, conv in enumerate(self.convs[:-1]):
            x = conv(x)
            if self.actnorms[i] is not None:
                x = self.actnorms[i](x)
            x = jax.nn.leaky_relu(x, self.leaky)
        return self.convs[-1](x)
