"""Radial flow (reference: normflows/flows/radial.py:8-46)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.flow import Flow


class Radial(Flow):
    """f(z) = z + beta * h(alpha, r) * (z - z0); forward only (radial.py:37-46)."""

    beta: jnp.ndarray
    alpha: jnp.ndarray
    z_0: jnp.ndarray

    @classmethod
    def create(cls, shape, z_0=None, key=None, seed: int = 0):
        if isinstance(shape, int):
            shape = (shape,)
        if key is None:
            key = jax.random.key(seed)
        kb, ka, kz = jax.random.split(key, 3)
        lim = 1.0 / float(np.prod(shape))
        beta = jax.random.uniform(kb, (1,), minval=-lim - 1.0, maxval=lim - 1.0)
        alpha = jax.random.uniform(ka, (1,), minval=-lim, maxval=lim)
        if z_0 is None:
            z_0 = jax.random.normal(kz, (1, *shape))
        return cls(beta=beta, alpha=alpha, z_0=jnp.asarray(z_0))

    def forward(self, z, context=None, *, key=None):
        d = float(np.prod(self.z_0.shape[1:]))
        beta = jax.nn.softplus(self.beta) - jnp.abs(self.alpha)
        dz = z - self.z_0
        axes = tuple(range(1, self.z_0.ndim))
        r = jnp.sqrt(jnp.sum(dz**2, axis=axes, keepdims=True))
        h = beta / (jnp.abs(self.alpha) + r)
        h_prime = -beta * r / (jnp.abs(self.alpha) + r) ** 2
        z_ = z + h * dz
        log_det = (d - 1.0) * jnp.log(1.0 + h) + jnp.log(1.0 + h + h_prime)
        return z_, log_det.reshape(-1)
