"""Data-space preprocessing bijectors (reference: normflows/transforms.py:8-77)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .core.module import static_field
from .core.flow import Flow, zero_log_det_like_z


class Logit(Flow):
    """logit(alpha + (1 - 2*alpha) * x) dequant bijector (transforms.py:8-47).

    forward: latent -> data ([0,1] image space); inverse: data -> unbounded.
    """

    alpha: float = static_field(default=0.05)

    def forward(self, z, context=None, *, key=None):
        beta = 1.0 - 2.0 * self.alpha
        axes = tuple(range(1, z.ndim))
        ls = jnp.sum(jax.nn.log_sigmoid(z), axis=axes)
        mls = jnp.sum(jax.nn.log_sigmoid(-z), axis=axes)
        n = float(np.prod(z.shape[1:]))
        log_det = -np.log(beta) * n + ls + mls
        z = (jax.nn.sigmoid(z) - self.alpha) / beta
        return z, log_det

    def inverse(self, z, context=None, *, key=None):
        beta = 1.0 - 2.0 * self.alpha
        z = self.alpha + beta * z
        logz = jnp.log(z)
        log1mz = jnp.log1p(-z)
        out = logz - log1mz
        axes = tuple(range(1, z.ndim))
        n = float(np.prod(z.shape[1:]))
        log_det = (
            np.log(beta) * n - jnp.sum(logz, axis=axes) - jnp.sum(log1mz, axis=axes)
        )
        return out, log_det


class Shift(Flow):
    """Constant shift flow (transforms.py:50-77)."""

    shift: float = static_field(default=-0.5)

    def forward(self, z, context=None, *, key=None):
        return z - self.shift, zero_log_det_like_z(z)

    def inverse(self, z, context=None, *, key=None):
        return z + self.shift, zero_log_det_like_z(z)
