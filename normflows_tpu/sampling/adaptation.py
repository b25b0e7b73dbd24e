"""HMC step-size adaptation (dual averaging, Hoffman & Gelman 2014).

BASELINE-mandated extension beyond the reference (SURVEY.md §7 item 8): the
reference's HMC layers use fixed (learnable) step sizes; this module tunes
them to a target acceptance rate before sampling/training.  Pure-functional:
the adapted state is carried explicitly and the tuned flow layer is returned.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.flow import sum_except_batch


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray
    log_step_avg: jnp.ndarray
    h_bar: jnp.ndarray
    mu: jnp.ndarray
    t: jnp.ndarray


def dual_averaging_init(init_step_size) -> DualAveragingState:
    log_step = jnp.log(jnp.asarray(init_step_size, jnp.float32))
    return DualAveragingState(
        log_step=log_step,
        log_step_avg=log_step,
        h_bar=jnp.zeros_like(log_step),
        mu=jnp.log(10.0) + log_step,
        t=jnp.zeros((), jnp.float32),
    )


def dual_averaging_update(
    state: DualAveragingState,
    accept_prob,
    target: float = 0.8,
    gamma: float = 0.05,
    t0: float = 10.0,
    kappa: float = 0.75,
) -> DualAveragingState:
    t = state.t + 1.0
    eta_h = 1.0 / (t + t0)
    h_bar = (1.0 - eta_h) * state.h_bar + eta_h * (target - accept_prob)
    log_step = state.mu - jnp.sqrt(t) / gamma * h_bar
    eta = t**-kappa
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, h_bar, state.mu, t)


def hmc_accept_prob(hmc, z, key):
    """One HMC transition's mean acceptance probability (no state update)."""
    kp, _ = jax.random.split(key)
    p = jax.random.normal(kp, z.shape, z.dtype) * jnp.exp(0.5 * hmc.log_mass)
    step_size = jnp.exp(hmc.log_step_size)
    mass = jnp.exp(hmc.log_mass)

    def leapfrog(carry, _):
        z_new, p_new = carry
        p_half = p_new + (step_size / 2.0) * hmc.grad_log_p(z_new)
        z_new = z_new + step_size * (p_half / mass)
        p_new = p_half + (step_size / 2.0) * hmc.grad_log_p(z_new)
        return (z_new, p_new), None

    (z_new, p_new), _ = jax.lax.scan(leapfrog, (z, p), None, length=hmc.steps)
    log_accept = (
        hmc.target.log_prob(z_new)
        - hmc.target.log_prob(z)
        - 0.5 * sum_except_batch(p_new**2 / mass)
        + 0.5 * sum_except_batch(p**2 / mass)
    )
    return jnp.mean(jnp.minimum(1.0, jnp.exp(log_accept)))


def adapt_step_size(
    hmc,
    key,
    z0,
    num_adapt: int = 100,
    target: float = 0.8,
):
    """Tune an HMC layer's step size by dual averaging; returns (hmc, info).

    ``z0``: batch of chain states to adapt on.  The chains are advanced with
    the current step size between adaptation updates so the tuning sees the
    typical set.  Jit-safe (one fused scan).
    """
    da0 = dual_averaging_init(jnp.exp(hmc.log_step_size))

    def body(carry, step_key):
        z, da = carry
        h = hmc.replace(log_step_size=da.log_step)
        k1, k2 = jax.random.split(step_key)
        a = hmc_accept_prob(h, z, k1)
        da = dual_averaging_update(da, a, target=target)
        z, _ = h.forward(z, key=k2)
        return (z, da), a

    keys = jax.random.split(key, num_adapt)
    (z, da), accepts = jax.lax.scan(body, (z0, da0), keys)
    tuned = hmc.replace(log_step_size=da.log_step_avg)
    info = {"accept_rate": accepts, "final_step_size": jnp.exp(da.log_step_avg)}
    return tuned, info
