"""Stochastic (MCMC) flow layers for SNF (reference: normflows/flows/stochastic.py).

TPU-first changes: the per-step Python loops (stochastic.py:31-44, 82-85)
become ``lax.scan`` bodies over explicitly-split PRNG keys; all chains advance
in lockstep on the batch axis (vmap/shard-ready).  ``gradlogP`` is plain
``jax.grad`` of the target log-density — gradients flow through the leapfrog
w.r.t. the learnable ``log_step_size``/``log_mass`` exactly as in the
reference, and the accept/reject select passes gradients only through the
chosen branch (``jnp.where`` semantics, matching torch.where).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.module import Module, static_field
from ..core.flow import Flow, sum_except_batch


def _require_key(key, layer_name):
    """Stochastic layers must receive fresh randomness on every call.

    The reference draws from torch's global RNG (stochastic.py:76), so each
    call gets fresh noise implicitly; a silent fixed-key fallback here would
    reuse identical noise across calls and layers — a correctness trap.
    """
    if key is None:
        raise ValueError(
            f"{layer_name} is a stochastic flow layer and requires an explicit"
            " PRNG key; pass key= through the facade call, e.g."
            " model.log_prob(x, key=jax.random.key(step))."
        )
    return key


class MetropolisHastings(Flow):
    """MH as a flow layer (stochastic.py:6-49); log_det = log p(z) - log p(z')."""

    target: Module
    proposal: Module
    steps: int = static_field(default=1)

    def forward(self, z, context=None, *, key=None, noise=None):
        """``noise`` (optional) replays pre-drawn randomness instead of the
        key: a ``(eps, w)`` pair with proposal standard normals ``eps`` of
        shape ``(steps, batch, *event)`` and accept uniforms ``w`` of shape
        ``(steps, batch)``.  Matches the reference's draw order
        (stochastic.py:33,36) for deterministic replay / parity oracles."""
        if noise is None:
            key = _require_key(key, "MetropolisHastings")
        log_p = self.target.log_prob(z)
        log_det = jnp.zeros(z.shape[0], z.dtype)

        def step(carry, z_, log_p_diff, w):
            z, log_p, log_det = carry
            log_p_ = self.target.log_prob(z_)
            w_accept = jnp.minimum(jnp.exp(log_p_ - log_p + log_p_diff), 1.0)
            accept = w <= w_accept
            accept_b = accept.reshape(-1, *([1] * (z.ndim - 1)))
            z_new = jnp.where(accept_b, z_, z)
            log_det_new = jnp.where(accept, log_det + log_p - log_p_, log_det)
            log_p_new = jnp.where(accept, log_p_, log_p)
            return (z_new, log_p_new, log_det_new)

        if noise is None:
            def body(carry, step_key):
                kp, ka = jax.random.split(step_key)
                z_, log_p_diff = self.proposal(carry[0], kp)
                w = jax.random.uniform(ka, (z.shape[0],), z.dtype)
                return step(carry, z_, log_p_diff, w), None

            xs = jax.random.split(key, self.steps)
        else:
            def body(carry, step_noise):
                eps, w = step_noise
                z_, log_p_diff = self.proposal.propose_from_noise(carry[0], eps)
                return step(carry, z_, log_p_diff, w), None

            eps_arr = jnp.asarray(noise[0], z.dtype)
            w_arr = jnp.asarray(noise[1], z.dtype)
            # lax.scan takes its length from the noise arrays — a wrong
            # leading dim would silently run a different number of MH steps.
            if eps_arr.shape[0] != self.steps or w_arr.shape[0] != self.steps:
                raise ValueError(
                    f"noise leading dim must equal steps={self.steps}; got "
                    f"eps {eps_arr.shape[0]}, w {w_arr.shape[0]}"
                )
            xs = (eps_arr, w_arr)

        (z, _, log_det), _ = jax.lax.scan(body, (z, log_p, log_det), xs)
        return z, log_det

    def inverse(self, z, context=None, *, key=None, noise=None):
        return self.forward(z, context, key=key, noise=noise)

    def data_dep_init(self, z, context=None):
        """Identity transport: MCMC layers target their own stationary
        distribution, so skipping the move is a sound key-free approximation
        for downstream ActNorm init statistics."""
        return self, z

    def data_dep_init_forward(self, z, context=None):
        return self, z


class HamiltonianMonteCarlo(Flow):
    """HMC flow layer with learnable step size and mass (stochastic.py:52-109)."""

    target: Module
    log_step_size: jnp.ndarray
    log_mass: jnp.ndarray
    steps: int = static_field(default=1)
    max_abs_grad: Optional[float] = static_field(default=None)

    @classmethod
    def create(cls, target, steps, log_step_size, log_mass, max_abs_grad=None):
        return cls(
            target=target,
            log_step_size=jnp.asarray(log_step_size, jnp.float32),
            log_mass=jnp.asarray(log_mass, jnp.float32),
            steps=steps,
            max_abs_grad=max_abs_grad,
        )

    def grad_log_p(self, z):
        """stochastic.py:103-109 with optional gradient clipping."""
        grad = jax.grad(lambda z_: jnp.sum(self.target.log_prob(z_)))(z)
        if self.max_abs_grad is not None:
            grad = jnp.clip(grad, -self.max_abs_grad, self.max_abs_grad)
        return grad

    def forward(self, z, context=None, *, key=None, noise=None):
        """``noise`` (optional) replays pre-drawn randomness instead of the
        key: a ``(p_eps, u)`` pair with momentum standard normals ``p_eps``
        of shape ``z.shape`` and accept uniforms ``u`` of shape ``(batch,)``
        — the reference's exact draws (stochastic.py:76,94)."""
        if noise is None:
            key = _require_key(key, "HamiltonianMonteCarlo")
            kp, ka = jax.random.split(key)
            p_eps = jax.random.normal(kp, z.shape, z.dtype)
        else:
            p_eps = jnp.asarray(noise[0], z.dtype)
        p = p_eps * jnp.exp(0.5 * self.log_mass)

        step_size = jnp.exp(self.log_step_size)
        mass = jnp.exp(self.log_mass)

        def leapfrog(carry, _):
            z_new, p_new = carry
            p_half = p_new + (step_size / 2.0) * self.grad_log_p(z_new)
            z_new = z_new + step_size * (p_half / mass)
            p_new = p_half + (step_size / 2.0) * self.grad_log_p(z_new)
            return (z_new, p_new), None

        (z_new, p_new), _ = jax.lax.scan(leapfrog, (z, p), None, length=self.steps)

        # MH correction (stochastic.py:88-96)
        log_accept = (
            self.target.log_prob(z_new)
            - self.target.log_prob(z)
            - 0.5 * sum_except_batch(p_new**2 / mass)
            + 0.5 * sum_except_batch(p**2 / mass)
        )
        if noise is None:
            u = jax.random.uniform(ka, (z.shape[0],), z.dtype)
        else:
            u = jnp.asarray(noise[1], z.dtype)
        accept = u < jnp.exp(log_accept)
        accept_b = accept.reshape(-1, *([1] * (z.ndim - 1)))
        z_out = jnp.where(accept_b, z_new, z)
        return z_out, self.target.log_prob(z) - self.target.log_prob(z_out)

    def inverse(self, z, context=None, *, key=None, noise=None):
        return self.forward(z, context, key=key, noise=noise)

    def data_dep_init(self, z, context=None):
        """Identity transport (see MetropolisHastings.data_dep_init)."""
        return self, z

    def data_dep_init_forward(self, z, context=None):
        return self, z
