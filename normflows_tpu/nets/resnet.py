"""Residual parameter networks (reference: normflows/nets/resnet.py)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.module import Module, static_field
from .mlp import Linear
from .cnn import Conv2d


def _dropout(x, p, key, train):
    """Inverted dropout between the block's second activation and linear
    (resnet.py:43-48, 146-151): applied only at train time with an explicit
    PRNG key; without a key the net is the reference's eval-mode function."""
    if not train or key is None or p == 0.0:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _check_no_batch_norm(use_batch_norm):
    if use_batch_norm:
        raise NotImplementedError(
            "use_batch_norm=True is not supported: the reference's own"
            " examples never enable it and its NSF wrappers hard-code it to"
            " False (neural_spline/wrapper.py:60,154,234); batch-stat state"
            " has no place in this framework's pure-functional net tier."
        )


def _act(name, x):
    if name == "relu":
        return jax.nn.relu(x)
    if name == "tanh":
        return jnp.tanh(x)
    raise NotImplementedError(name)


class ResidualBlock(Module):
    """Pre-activation residual MLP block with GLU context gate (resnet.py:7-50)."""

    linear_0: Linear
    linear_1: Linear
    context_layer: Optional[Linear]
    activation: str = static_field(default="relu")
    dropout_probability: float = static_field(default=0.0)

    @classmethod
    def create(cls, key, features, context_features=None, activation="relu",
               dropout_probability=0.0, zero_initialization=True):
        k0, k1, kc, kz1, kz2 = jax.random.split(key, 5)
        linear_0 = Linear.create(k0, features, features, init="torch")
        linear_1 = Linear.create(k1, features, features, init="torch")
        if zero_initialization:
            linear_1 = linear_1.replace(
                weight=jax.random.uniform(kz1, (features, features), minval=-1e-3, maxval=1e-3),
                bias=jax.random.uniform(kz2, (features,), minval=-1e-3, maxval=1e-3),
            )
        ctx = (
            Linear.create(kc, context_features, features, init="torch")
            if context_features is not None
            else None
        )
        return cls(linear_0=linear_0, linear_1=linear_1, context_layer=ctx,
                   activation=activation, dropout_probability=dropout_probability)

    def __call__(self, x, context=None, *, key=None, train=False):
        temps = _act(self.activation, x)
        temps = self.linear_0(temps)
        temps = _act(self.activation, temps)
        temps = _dropout(temps, self.dropout_probability, key, train)
        temps = self.linear_1(temps)
        if context is not None and self.context_layer is not None:
            temps = temps * jax.nn.sigmoid(self.context_layer(context))
        return x + temps


class ResidualNet(Module):
    """Residual MLP with optional context concat at input (resnet.py:53-104)."""

    initial_layer: Linear
    blocks: tuple
    final_layer: Linear
    preprocessing: Optional[Module]
    hidden_features: int = static_field(default=0)

    @classmethod
    def create(cls, key, in_features, out_features, hidden_features,
               context_features=None, num_blocks=2, activation="relu",
               dropout_probability=0.0, use_batch_norm=False,
               preprocessing=None):
        _check_no_batch_norm(use_batch_norm)
        keys = jax.random.split(key, num_blocks + 2)
        in_dim = in_features + (context_features or 0)
        initial = Linear.create(keys[0], in_dim, hidden_features, init="torch")
        blocks = tuple(
            ResidualBlock.create(
                keys[1 + i], hidden_features, context_features=context_features,
                activation=activation, dropout_probability=dropout_probability,
            )
            for i in range(num_blocks)
        )
        final = Linear.create(keys[-1], hidden_features, out_features, init="torch")
        return cls(
            initial_layer=initial, blocks=blocks, final_layer=final,
            preprocessing=preprocessing, hidden_features=hidden_features,
        )

    def __call__(self, x, context=None, *, key=None, train=False):
        temps = self.preprocessing(x) if self.preprocessing is not None else x
        if context is not None:
            temps = jnp.concatenate([temps, context], axis=1)
        temps = self.initial_layer(temps)
        keys = (jax.random.split(key, len(self.blocks))
                if key is not None else [None] * len(self.blocks))
        for block, k in zip(self.blocks, keys):
            temps = block(temps, context, key=k, train=train)
        return self.final_layer(temps)


class ConvResidualBlock(Module):
    """3x3 conv residual block with 1x1 context gate (resnet.py:107-153)."""

    conv_0: Conv2d
    conv_1: Conv2d
    context_layer: Optional[Conv2d]
    activation: str = static_field(default="relu")
    dropout_probability: float = static_field(default=0.0)

    @classmethod
    def create(cls, key, channels, context_channels=None, activation="relu",
               dropout_probability=0.0, zero_initialization=True):
        k0, k1, kc, kz = jax.random.split(key, 4)
        conv_0 = Conv2d.create(k0, channels, channels, 3)
        conv_1 = Conv2d.create(k1, channels, channels, 3)
        if zero_initialization:
            conv_1 = conv_1.replace(
                weight=jax.random.uniform(
                    kz, conv_1.weight.shape, minval=-1e-3, maxval=1e-3
                ),
                bias=jax.random.uniform(kc, (channels,), minval=-1e-3, maxval=1e-3),
            )
        ctx = (
            Conv2d.create(kc, context_channels, channels, 1)
            if context_channels is not None
            else None
        )
        return cls(conv_0=conv_0, conv_1=conv_1, context_layer=ctx,
                   activation=activation, dropout_probability=dropout_probability)

    def __call__(self, x, context=None, *, key=None, train=False):
        temps = _act(self.activation, x)
        temps = self.conv_0(temps)
        temps = _act(self.activation, temps)
        temps = _dropout(temps, self.dropout_probability, key, train)
        temps = self.conv_1(temps)
        if context is not None and self.context_layer is not None:
            temps = temps * jax.nn.sigmoid(self.context_layer(context))
        return x + temps


class ConvResidualNet(Module):
    """Conv residual net: 1x1 in/out, 3x3 blocks (resnet.py:156-209)."""

    initial_layer: Conv2d
    blocks: tuple
    final_layer: Conv2d
    hidden_channels: int = static_field(default=0)

    @classmethod
    def create(cls, key, in_channels, out_channels, hidden_channels,
               context_channels=None, num_blocks=2, activation="relu",
               dropout_probability=0.0, use_batch_norm=False):
        _check_no_batch_norm(use_batch_norm)
        keys = jax.random.split(key, num_blocks + 2)
        in_ch = in_channels + (context_channels or 0)
        initial = Conv2d.create(keys[0], in_ch, hidden_channels, 1)
        blocks = tuple(
            ConvResidualBlock.create(
                keys[1 + i], hidden_channels, context_channels=context_channels,
                activation=activation, dropout_probability=dropout_probability,
            )
            for i in range(num_blocks)
        )
        final = Conv2d.create(keys[-1], hidden_channels, out_channels, 1)
        return cls(initial_layer=initial, blocks=blocks, final_layer=final,
                   hidden_channels=hidden_channels)

    def __call__(self, x, context=None, *, key=None, train=False):
        if context is not None:
            x = jnp.concatenate([x, context], axis=1)
        temps = self.initial_layer(x)
        keys = (jax.random.split(key, len(self.blocks))
                if key is not None else [None] * len(self.blocks))
        for block, k in zip(self.blocks, keys):
            temps = block(temps, context, key=k, train=train)
        return self.final_layer(temps)
