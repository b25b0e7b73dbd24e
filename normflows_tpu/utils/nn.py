"""NN helper layers (reference: normflows/utils/nn.py:7-193), as pytree modules."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.module import Module, static_field, buffer_field
from ..core.flow import sum_except_batch  # re-export convenience

__all__ = [
    "ConstScaleLayer",
    "ClampExp",
    "ActNorm",
    "PeriodicFeaturesElementwise",
    "PeriodicFeaturesCat",
    "tile",
    "sum_except_batch",
    "net_dropout_active",
]


def net_dropout_active(net, key):
    """True when the param net has configured dropout AND a PRNG key was
    passed: train-time dropout applies exactly when the caller supplies
    randomness (the functional analogue of the reference's model.train())."""
    return key is not None and any(
        getattr(b, "dropout_probability", 0.0) > 0.0
        for b in getattr(net, "blocks", ())
    )


class ActNorm(Module):
    """ActNorm as a plain net layer (reference utils/nn.py:26-43): wraps the
    flow-version's affine transform, dropping the log-det."""

    actnorm: Module

    @classmethod
    def create(cls, shape):
        from ..flows.normalization import ActNorm as ActNormFlow

        return cls(actnorm=ActNormFlow.create(shape))

    def __call__(self, x):
        out, _ = self.actnorm.forward(x)
        return out


def tile(x, n: int):
    """Element-wise repeat: [x1, x2, ...] -> [x1]*n + [x2]*n + ... (nn.py:181-187)."""
    return jnp.repeat(jnp.reshape(x, -1), n)


class ConstScaleLayer(Module):
    """Multiply by a fixed constant (nn.py:7-20)."""

    scale: float = static_field(default=1.0)

    def __call__(self, x):
        return x * self.scale


class ClampExp(Module):
    """min(exp(lam*x), 1) output nonlinearity (nn.py:78-93)."""

    lam: float = static_field(default=1.0)

    def __call__(self, x):
        return jnp.minimum(jnp.exp(self.lam * x), 1.0)


class PeriodicFeaturesElementwise(Module):
    """Map periodic coordinates to w1*sin(s*f) + w2*cos(s*f) in place.

    Reference: utils/nn.py:96-143.  ``ind`` selects which input dims are
    periodic; those dims are replaced elementwise by the learned sin/cos mix,
    the rest pass through; output dims are re-ordered back to input order via a
    precomputed inverse permutation (nn.py:120-130).
    """

    ind: jnp.ndarray = buffer_field()  # periodic dims (int)
    rest_ind: jnp.ndarray = buffer_field()  # non-periodic dims
    inv_perm: jnp.ndarray = buffer_field()  # restore original order
    weights: jnp.ndarray  # (n_periodic, 2)
    scale: jnp.ndarray = buffer_field()  # frequency per periodic dim
    bias: jnp.ndarray = None  # optional phase
    activation: str = static_field(default=None)

    @classmethod
    def create(cls, ndim: int, ind, scale=1.0, bias: bool = False, activation=None):
        import numpy as np

        ind = np.asarray(ind, np.int32).reshape(-1)
        rest = np.asarray(
            [i for i in range(ndim) if i not in set(ind.tolist())], np.int32
        )
        perm = np.concatenate([ind, rest])
        inv_perm = np.zeros(ndim, np.int32)
        inv_perm[perm] = np.arange(ndim)
        n_p = ind.shape[0]
        scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (n_p,))
        weights = jnp.ones((n_p, 2), jnp.float32)
        b = jnp.zeros(n_p, jnp.float32) if bias else None
        return cls(
            ind=jnp.asarray(ind), rest_ind=jnp.asarray(rest),
            inv_perm=jnp.asarray(inv_perm), weights=weights, scale=scale, bias=b,
            activation=activation,
        )

    def __call__(self, x):
        f = x[..., self.ind] * self.scale
        feat = self.weights[:, 0] * jnp.sin(f) + self.weights[:, 1] * jnp.cos(f)
        if self.bias is not None:
            feat = feat + self.bias
        if self.activation == "tanh":
            feat = jnp.tanh(feat)
        out = jnp.concatenate([feat, x[..., self.rest_ind]], axis=-1)
        return out[..., self.inv_perm]

    def apply_t(self, x_t):
        """Transposed layout: features on axis 0, batch on axis -1."""
        f = x_t[self.ind, :] * self.scale[:, None]
        feat = (self.weights[:, :1] * jnp.sin(f)
                + self.weights[:, 1:2] * jnp.cos(f))
        if self.bias is not None:
            feat = feat + self.bias[:, None]
        if self.activation == "tanh":
            feat = jnp.tanh(feat)
        out = jnp.concatenate([feat, x_t[self.rest_ind, :]], axis=0)
        return out[self.inv_perm, :]


class PeriodicFeaturesCat(Module):
    """Concatenate sin/cos of periodic dims instead of replacing (nn.py:146-178)."""

    ind: jnp.ndarray = buffer_field()
    rest_ind: jnp.ndarray = buffer_field()
    scale: jnp.ndarray = buffer_field()

    @classmethod
    def create(cls, ndim: int, ind, scale=1.0):
        ind = jnp.asarray(ind, jnp.int32).reshape(-1)
        rest = jnp.asarray(
            [i for i in range(ndim) if i not in set(int(j) for j in ind)], jnp.int32
        )
        n_p = ind.shape[0]
        scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (n_p,))
        return cls(ind=ind, rest_ind=rest, scale=scale)

    def __call__(self, x):
        f = x[..., self.ind] * self.scale
        return jnp.concatenate([jnp.sin(f), jnp.cos(f), x[..., self.rest_ind]], axis=-1)
