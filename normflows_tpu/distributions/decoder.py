"""VAE decoder likelihoods p(x|z) (reference: normflows/distributions/decoder.py)."""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module

LOG2PI = math.log(2.0 * math.pi)


class BaseDecoder(Module):
    def __call__(self, z):
        raise NotImplementedError

    def log_prob(self, x, z):
        raise NotImplementedError


def _tile_x_to_z(x, z):
    """Repeat x along batch to match z when z = batch*samples (decoder.py:59-63)."""
    if z.shape[0] > x.shape[0]:
        reps = z.shape[0] // x.shape[0]
        x = jnp.repeat(x[:, None], reps, axis=1).reshape(-1, *x.shape[1:])
    return x


class NNDiagGaussianDecoder(BaseDecoder):
    """Diagonal Gaussian p(x|z) with NN mean/log-var (decoder.py:33-70)."""

    net: Module

    def __call__(self, z):
        mean_std = self.net(z)
        n_hidden = mean_std.shape[1] // 2
        mean = mean_std[:, :n_hidden, ...]
        std = jnp.exp(0.5 * mean_std[:, n_hidden:, ...])
        return mean, std

    def log_prob(self, x, z):
        mean_std = self.net(z)
        n_hidden = mean_std.shape[1] // 2
        mean = mean_std[:, :n_hidden, ...]
        var = jnp.exp(mean_std[:, n_hidden:, ...])
        x = _tile_x_to_z(x, z)
        d = float(np.prod(x.shape[1:]))
        axes = tuple(range(1, x.ndim))
        return -0.5 * d * LOG2PI - 0.5 * jnp.sum(
            jnp.log(var) + (x - mean) ** 2 / var, axis=axes
        )


class NNBernoulliDecoder(BaseDecoder):
    """Bernoulli p(x|z) with NN logits (decoder.py:73-102).

    Uses the numerically stable log-sigmoid (decoder.py:98-101).
    """

    net: Module

    def __call__(self, z):
        return jax.nn.sigmoid(self.net(z))

    def log_prob(self, x, z):
        score = self.net(z)
        x = _tile_x_to_z(x, z)
        axes = tuple(range(1, x.ndim))
        return jnp.sum(
            x * jax.nn.log_sigmoid(score) + (1 - x) * jax.nn.log_sigmoid(-score),
            axis=axes,
        )
