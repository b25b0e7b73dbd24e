"""MH proposal distributions (reference: normflows/distributions/mh_proposal.py)."""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module, static_field, buffer_field


class MHProposal(Module):
    """Proposal contract: __call__(z, key) -> (z', log p(z|z') - log p(z'|z))."""

    def sample(self, z, key):
        raise NotImplementedError

    def log_prob(self, z_, z):
        raise NotImplementedError

    def __call__(self, z, key):
        raise NotImplementedError

    def propose_from_noise(self, z, eps):
        """Deterministic replay hook: build the proposal from pre-drawn
        standard-normal noise ``eps`` instead of a PRNG key.  Used by
        reproducibility tooling and the injected-randomness parity oracle
        (the reference draws the same eps via torch.randn,
        mh_proposal.py:80-84)."""
        raise NotImplementedError


class DiagGaussianProposal(MHProposal):
    """Gaussian random-walk proposal; symmetric so the ratio is 0
    (mh_proposal.py:47-83)."""

    scale: jnp.ndarray = buffer_field()
    shape: tuple = static_field()

    @classmethod
    def create(cls, shape, scale):
        if isinstance(shape, int):
            shape = (shape,)
        return cls(scale=jnp.asarray(scale, jnp.float32), shape=tuple(shape))

    def sample(self, z, key):
        eps = jax.random.normal(key, (z.shape[0], *self.shape), z.dtype)
        return eps * self.scale + z

    def log_prob(self, z_, z):
        d = float(np.prod(self.shape))
        axes = tuple(range(1, z.ndim))
        return -0.5 * d * math.log(2 * math.pi) - jnp.sum(
            jnp.log(self.scale) + 0.5 * ((z_ - z) / self.scale) ** 2, axis=axes
        )

    def __call__(self, z, key):
        z_ = self.sample(z, key)
        return z_, jnp.zeros(z.shape[0], z.dtype)

    def propose_from_noise(self, z, eps):
        return eps * self.scale + z, jnp.zeros(z.shape[0], z.dtype)
