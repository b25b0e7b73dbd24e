"""Planar flow (reference: normflows/flows/planar.py:8-81)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import static_field
from ..core.flow import Flow


class Planar(Flow):
    """f(z) = z + u * h(w.z + b), u reparametrized so w.u > -1 (planar.py:55-56)."""

    u: jnp.ndarray
    w: jnp.ndarray
    b: jnp.ndarray
    act: str = static_field(default="tanh")

    @classmethod
    def create(cls, shape, act="tanh", u=None, w=None, b=None, key=None, seed: int = 0):
        if isinstance(shape, int):
            shape = (shape,)
        if key is None:
            key = jax.random.key(seed)
        ku, kw = jax.random.split(key)
        lim_w = float(np.sqrt(2.0 / np.prod(shape)))
        lim_u = float(np.sqrt(2.0))
        if u is None:
            u = jax.random.uniform(ku, (1, *shape), minval=-lim_u, maxval=lim_u)
        if w is None:
            w = jax.random.uniform(kw, (1, *shape), minval=-lim_w, maxval=lim_w)
        if b is None:
            b = jnp.zeros(1)
        if act not in ("tanh", "leaky_relu"):
            raise NotImplementedError("Nonlinearity is not implemented.")
        return cls(u=jnp.asarray(u), w=jnp.asarray(w), b=jnp.asarray(b), act=act)

    def _constrained_u(self):
        inner = jnp.sum(self.w * self.u)
        return self.u + (jax.nn.softplus(inner) - 1.0 - inner) * self.w / jnp.sum(
            self.w**2
        )

    def forward(self, z, context=None, *, key=None):
        axes = tuple(range(1, self.w.ndim))
        lin = jnp.sum(self.w * z, axis=axes, keepdims=True) + self.b
        u = self._constrained_u()
        if self.act == "tanh":
            h = jnp.tanh(lin)
            h_prime = 1.0 / jnp.cosh(lin.reshape(-1)) ** 2
        else:  # leaky_relu
            h = jax.nn.leaky_relu(lin, 0.2)
            h_prime = jnp.where(lin.reshape(-1) < 0, 0.2, 1.0)
        z_ = z + u * h
        log_det = jnp.log(jnp.abs(1.0 + jnp.sum(self.w * u) * h_prime))
        return z_, log_det

    def inverse(self, z, context=None, *, key=None):
        if self.act != "leaky_relu":
            raise NotImplementedError("This flow has no algebraic inverse.")
        axes = tuple(range(1, self.w.ndim))
        lin = jnp.sum(self.w * z, axis=axes) + self.b
        a = jnp.where(lin < 0, 0.2, 1.0)  # absorb leaky slope into u
        u = self._constrained_u()
        dims = (-1,) + (1,) * (u.ndim - 1)
        u = a.reshape(dims) * u
        inner_ = jnp.sum(self.w * u, axis=axes)
        z_ = z - u * (lin / (1.0 + inner_)).reshape(dims)
        log_det = -jnp.log(jnp.abs(1.0 + inner_))
        return z_, log_det
