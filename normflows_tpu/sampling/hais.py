"""Hamiltonian Annealed Importance Sampling (reference: normflows/sampling/hais.py).

Chains advance in lockstep on the batch axis; shard the batch axis over a
device mesh for chain parallelism (see parallel/chains.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.module import Module
from ..distributions.linear_interpolation import LinearInterpolation
from ..flows.stochastic import HamiltonianMonteCarlo


class HAIS(Module):
    """Annealed importance sampling with HMC transitions (hais.py:8-49)."""

    prior: Module
    target: Module
    layers: tuple

    @classmethod
    def create(cls, betas, prior, target, num_leapfrog, step_size, log_mass):
        """betas: 1 = beta_0 > beta_1 > ... > beta_n = 0 (hais.py:17-22)."""
        import numpy as np

        betas = np.asarray(betas)
        n = betas.shape[0] - 1
        layers = []
        for i in range(n - 1, 0, -1):
            intermediate = LinearInterpolation(
                dist1=target, dist2=prior, alpha=float(betas[i])
            )
            layers.append(
                HamiltonianMonteCarlo.create(
                    intermediate, num_leapfrog, jnp.log(jnp.asarray(step_size)),
                    log_mass,
                )
            )
        return cls(prior=prior, target=target, layers=tuple(layers))

    def sample(self, key, num_samples: int):
        """Weighted samples from the target (hais.py:37-49)."""
        keys = jax.random.split(key, len(self.layers) + 1)
        samples, log_weights = self.prior.sample_and_log_prob(keys[0], num_samples)
        log_weights = -log_weights
        for i, layer in enumerate(self.layers):
            samples, lw_add = layer.forward(samples, key=keys[i + 1])
            log_weights = log_weights + lw_add
        log_weights = log_weights + self.target.log_prob(samples)
        return samples, log_weights
