"""Flow-preconditioned HMC (NeuTra; Hoffman et al. 2019).

BASELINE-mandated extension (SURVEY.md §7 item 8): run HMC in the latent
space of a trained normalizing flow.  The pullback target

    log pi~(u) = log p(f(u)) + log |det df/du|

is well-conditioned when the flow approximates the target, so plain HMC with
a unit mass matrix mixes fast; pushed-forward samples f(u) follow the target.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module, static_field
from ..flows.stochastic import HamiltonianMonteCarlo
from .adaptation import adapt_step_size


class PullbackTarget(Module):
    """Latent-space density induced by pulling the target back through a flow.

    ``flow_model``: NormalizingFlow whose forward maps latent -> data;
    ``target``: data-space (unnormalized) density.  If ``target`` is None the
    flow's own target ``flow_model.p`` is used.
    """

    flow_model: Module
    target: Optional[Module] = None

    def log_prob(self, u, context=None):
        x, log_det = self.flow_model.forward_and_log_det(u)
        p = self.target if self.target is not None else self.flow_model.p
        return p.log_prob(x) + log_det


class NeuTraHMC(Module):
    """HMC in flow latent space with optional step-size adaptation."""

    flow_model: Module
    pullback: PullbackTarget
    num_leapfrog: int = static_field(default=10)
    init_step_size: float = static_field(default=0.2)

    @classmethod
    def create(cls, flow_model, target=None, num_leapfrog: int = 10,
               init_step_size: float = 0.2):
        return cls(
            flow_model=flow_model,
            pullback=PullbackTarget(flow_model=flow_model, target=target),
            num_leapfrog=num_leapfrog,
            init_step_size=init_step_size,
        )

    def _hmc(self, dim, log_step):
        return HamiltonianMonteCarlo.create(
            self.pullback, self.num_leapfrog, jnp.full(dim, log_step),
            jnp.zeros(dim),
        )

    def sample(self, key, num_chains: int, num_steps: int,
               num_adapt: int = 50, target_accept: float = 0.8):
        """Returns (data-space samples (steps, chains, dim), diagnostics).

        Chains start from the flow base; step size is tuned by dual averaging
        on the pullback density; the chain axis is shardable over a mesh.
        """
        k_init, k_adapt, k_run = jax.random.split(key, 3)
        u, _ = self.flow_model.q0.sample_and_log_prob(k_init, num_chains)
        dim = u.shape[-1]
        hmc = self._hmc(dim, np.log(self.init_step_size))
        hmc, info = adapt_step_size(
            hmc, k_adapt, u, num_adapt=num_adapt, target=target_accept
        )

        def body(u, step_key):
            u, _ = hmc.forward(u, key=step_key)
            return u, u

        keys = jax.random.split(k_run, num_steps)
        _, us = jax.lax.scan(body, u, keys)
        # push all latent samples through the flow
        flat = us.reshape(-1, dim)
        x = self.flow_model.forward(flat)
        return x.reshape(num_steps, num_chains, -1), info
