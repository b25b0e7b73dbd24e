"""VAE encoder distributions q(z|x) (reference: normflows/distributions/encoder.py).

Shape convention: samples are (batch, num_samples, *event) (encoder.py:44-46).
``sample_and_log_prob(key, x, num_samples)`` replaces ``forward``.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module, static_field

LOG2PI = math.log(2.0 * math.pi)


class BaseEncoder(Module):
    def sample_and_log_prob(self, key, x, num_samples: int = 1):
        raise NotImplementedError

    def log_prob(self, z, x):
        raise NotImplementedError

    def __call__(self, key, x, num_samples: int = 1):
        return self.sample_and_log_prob(key, x, num_samples)


class Dirac(BaseEncoder):
    """z = x deterministic (encoder.py:38-49)."""

    def sample_and_log_prob(self, key, x, num_samples: int = 1):
        z = jnp.repeat(x[:, None], num_samples, axis=1)
        return z, jnp.zeros(z.shape[:2])

    def log_prob(self, z, x):
        return jnp.zeros(z.shape[:2])


class Uniform(BaseEncoder):
    """Uniform on [zmin, zmax] independent of x (encoder.py:52-70)."""

    zmin: float = static_field(default=0.0)
    zmax: float = static_field(default=1.0)

    def sample_and_log_prob(self, key, x, num_samples: int = 1):
        shape = (x.shape[0], num_samples, *x.shape[1:])
        z = jax.random.uniform(key, shape, minval=self.zmin, maxval=self.zmax)
        log_q = jnp.full(z.shape[:2], -math.log(self.zmax - self.zmin))
        return z, log_q

    def log_prob(self, z, x):
        return jnp.full(z.shape[:2], -math.log(self.zmax - self.zmin))


class ConstDiagGaussian(BaseEncoder):
    """Gaussian with parameters constant w.r.t. x (encoder.py:73-126)."""

    loc: jnp.ndarray  # (1, 1, d)
    scale: jnp.ndarray

    @classmethod
    def create(cls, loc, scale):
        loc = jnp.asarray(loc, jnp.float32).reshape(1, 1, -1)
        return cls(loc=loc, scale=jnp.asarray(scale, jnp.float32))

    @property
    def d(self):
        return self.loc.shape[-1]

    def sample_and_log_prob(self, key, x=None, num_samples: int = 1):
        batch_size = x.shape[0] if x is not None else 1
        eps = jax.random.normal(key, (batch_size, num_samples, self.d))
        z = self.loc + self.scale * eps
        log_q = -0.5 * self.d * LOG2PI - jnp.sum(
            jnp.log(self.scale) + 0.5 * eps**2, axis=2
        )
        return z, log_q

    def log_prob(self, z, x):
        if z.ndim == 1:
            z = z[None]
        if z.ndim == 2:
            z = z[None]
        return -0.5 * self.d * LOG2PI - jnp.sum(
            jnp.log(self.scale) + 0.5 * ((z - self.loc) / self.scale) ** 2, axis=2
        )


class NNDiagGaussian(BaseEncoder):
    """Gaussian with mean/log-var from a net (encoder.py:129-188).

    Net output channel convention: first half = mean, second half = log-var
    (std = exp(0.5 * raw), encoder.py:153-156).
    """

    net: Module

    def sample_and_log_prob(self, key, x, num_samples: int = 1):
        batch_size = x.shape[0]
        mean_std = self.net(x)
        n_hidden = mean_std.shape[1] // 2
        mean = mean_std[:, :n_hidden, ...][:, None]
        std = jnp.exp(0.5 * mean_std[:, n_hidden : 2 * n_hidden, ...][:, None])
        eps = jax.random.normal(key, (batch_size, num_samples, *mean.shape[2:]))
        z = mean + std * eps
        d = float(np.prod(z.shape[2:]))
        axes = tuple(range(2, z.ndim))
        log_q = -0.5 * d * LOG2PI - jnp.sum(jnp.log(std) + 0.5 * eps**2, axis=axes)
        return z, log_q

    def log_prob(self, z, x):
        if z.ndim == 1:
            z = z[None]
        if z.ndim == 2:
            z = z[None]
        mean_std = self.net(x)
        n_hidden = mean_std.shape[1] // 2
        mean = mean_std[:, :n_hidden, ...][:, None]
        var = jnp.exp(mean_std[:, n_hidden : 2 * n_hidden, ...][:, None])
        d = float(np.prod(z.shape[2:]))
        axes = tuple(range(2, z.ndim))
        return -0.5 * d * LOG2PI - 0.5 * jnp.sum(
            jnp.log(var) + (z - mean) ** 2 / var, axis=axes
        )
