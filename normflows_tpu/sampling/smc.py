"""Annealed sequential Monte Carlo with flow proposals and MCMC moves.

BASELINE-mandated extension (SURVEY.md §7 item 8): tempered SMC from a base
(or flow) proposal to a target, with importance reweighting, systematic
resampling, and HMC move steps.  Everything is static-shape and batched on
the particle axis, so the particle axis shards over a device mesh — the
resampling gather and the ESS/normalization reductions become XLA collectives
when sharded (the only communication in the sampler).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module, static_field
from ..distributions.linear_interpolation import LinearInterpolation
from ..flows.stochastic import HamiltonianMonteCarlo


def effective_sample_size(log_w):
    w = jax.nn.softmax(log_w)
    return 1.0 / jnp.sum(w**2)


def systematic_resample(key, log_w, particles):
    """Systematic resampling; returns (particles, uniform log weights).

    O(N) with one cumulative sum; the index lookup is a vectorized
    searchsorted (sharded-friendly: becomes an all-gather + local search
    under a sharded particle axis).
    """
    n = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    cumw = jnp.cumsum(w)
    u = jax.random.uniform(key, ())
    positions = (jnp.arange(n) + u) / n
    idx = jnp.clip(jnp.searchsorted(cumw, positions), 0, n - 1)
    return particles[idx], jnp.zeros(n)


class SMCState(NamedTuple):
    particles: jnp.ndarray
    log_w: jnp.ndarray
    log_z: jnp.ndarray  # accumulated log normalizing-constant estimate


class AnnealedSMC(Module):
    """Tempered SMC sampler.

    ``proposal``: distribution with sample_and_log_prob/log_prob — typically a
    trained :class:`~normflows_tpu.core.facades.NormalizingFlow` used as a
    flow proposal, or a plain base distribution.
    ``target``: unnormalized target with log_prob.
    ``betas``: temperature ladder 0 = beta_0 < ... < beta_M = 1 interpolating
    proposal -> target in log space.
    """

    proposal: Module
    target: Module
    betas: tuple = static_field()
    num_leapfrog: int = static_field(default=10)
    step_size: float = static_field(default=0.2)
    ess_threshold: float = static_field(default=0.5)

    @classmethod
    def create(cls, proposal, target, betas=None, num_temps: int = 16,
               num_leapfrog: int = 10, step_size: float = 0.2,
               ess_threshold: float = 0.5):
        if betas is None:
            betas = np.linspace(0.0, 1.0, num_temps)
        betas = tuple(float(b) for b in betas)
        # sample() initializes log_w = 0 and discards the proposal log_q,
        # which is exact ONLY for the documented beta_0 = 0 / beta_M = 1
        # endpoints (gamma_0 = q, so the initial weights are uniform);
        # any other ladder would silently bias every weight and log_z.
        if betas[0] != 0.0 or betas[-1] != 1.0:
            raise ValueError(
                f"betas must run 0.0 -> 1.0, got {betas[0]} -> {betas[-1]}"
            )
        return cls(
            proposal=proposal, target=target, betas=betas,
            num_leapfrog=num_leapfrog, step_size=step_size,
            ess_threshold=ess_threshold,
        )

    def _log_gamma(self, z, beta):
        """Tempered density gamma_beta — single source: _Tempered.log_prob
        (also the HMC move target, so reweighting and moves cannot drift)."""
        return _Tempered(
            proposal=self.proposal, target=self.target, beta=beta
        ).log_prob(z)

    def sample(self, key, num_particles: int):
        """Run SMC; returns (particles, log_w, log_z_estimate)."""
        k0, key = jax.random.split(key)
        z, log_q = self.proposal.sample_and_log_prob(k0, num_particles)
        state = SMCState(z, jnp.zeros(num_particles), jnp.zeros(()))

        dim = z.shape[-1]
        for i in range(1, len(self.betas)):
            beta_prev, beta = self.betas[i - 1], self.betas[i]
            key, kr, km = jax.random.split(key, 3)
            # reweight
            inc = self._log_gamma(state.particles, beta) - self._log_gamma(
                state.particles, beta_prev
            )
            log_w = state.log_w + inc
            # accumulate evidence before normalizing
            log_z = state.log_z + (
                jax.scipy.special.logsumexp(log_w)
                - jax.scipy.special.logsumexp(state.log_w)
            )
            # adaptive resampling on ESS collapse
            ess = effective_sample_size(log_w)
            do_resample = ess < self.ess_threshold * num_particles
            resampled, reset_w = systematic_resample(kr, log_w, state.particles)
            particles = jnp.where(do_resample, resampled, state.particles)
            log_w = jnp.where(do_resample, reset_w, log_w)
            # move: HMC targeting the current tempered density
            tempered = _Tempered(
                proposal=self.proposal, target=self.target, beta=beta
            )
            hmc = HamiltonianMonteCarlo.create(
                tempered, self.num_leapfrog,
                jnp.full(dim, np.log(self.step_size)), jnp.zeros(dim),
            )
            particles, _ = hmc.forward(particles, key=km)
            state = SMCState(particles, log_w, log_z)
        return state.particles, state.log_w, state.log_z


class _Tempered(Module):
    proposal: Module
    target: Module
    beta: float = static_field(default=1.0)

    def log_prob(self, z, context=None):
        return (1.0 - self.beta) * self.proposal.log_prob(z) + (
            self.beta
        ) * self.target.log_prob(z)
