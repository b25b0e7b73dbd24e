"""Statistical correctness of the MCMC kernels.

The reference only smoke-tests its stochastic layers (SURVEY.md §4;
stochastic_test.py:14-36 checks shapes).  These tests assert the actual
MCMC guarantees: stationarity of the target under the kernel, convergence
from an overdispersed start, and unbiasedness of the HAIS normalizing-
constant estimator — feasible here because chains are cheap under vmap'd
lax.scan on the batch axis.

Tolerances are set at ~5 standard errors of each Monte-Carlo estimator so
the tests are deterministic-seed-stable but would catch real kernel bugs
(wrong accept ratio, missing momentum term, sign errors).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from normflows_tpu import distributions
from normflows_tpu.core.module import Module
from normflows_tpu.flows.stochastic import HamiltonianMonteCarlo, MetropolisHastings
from normflows_tpu.sampling import HAIS


class _ShiftedGaussian(Module):
    """Unnormalized target: standard normal + known log-constant."""

    log_const: float = 0.0

    def log_prob(self, z, context=None):
        return self.log_const - 0.5 * jnp.sum(
            z**2 + np.log(2 * np.pi), axis=tuple(range(1, z.ndim))
        )


def test_hmc_leaves_target_invariant():
    """Chains started AT the target stay distributed per the target."""
    target = distributions.DiagGaussian.create(2).replace(
        loc=jnp.array([[1.0, -2.0]]), log_scale=jnp.log(jnp.array([[0.7, 1.5]]))
    )
    hmc = HamiltonianMonteCarlo.create(
        target, steps=8, log_step_size=jnp.log(jnp.full(2, 0.3)),
        log_mass=jnp.zeros(2),
    )
    n = 8192
    key = jax.random.key(0)
    z = target.sample(jax.random.key(1), n)
    for i in range(4):
        key, sub = jax.random.split(key)
        z, _ = jax.jit(hmc.forward)(z, key=sub)
    mean = np.asarray(jnp.mean(z, axis=0))
    std = np.asarray(jnp.std(z, axis=0))
    se = np.array([0.7, 1.5]) / np.sqrt(n)
    np.testing.assert_allclose(mean, [1.0, -2.0], atol=float(5 * se.max()))
    np.testing.assert_allclose(std, [0.7, 1.5], rtol=0.05)


def test_hmc_converges_from_overdispersed_start():
    target = distributions.DiagGaussian.create(2).replace(
        loc=jnp.array([[0.5, 0.5]]), log_scale=jnp.zeros((1, 2))
    )
    hmc = HamiltonianMonteCarlo.create(
        target, steps=10, log_step_size=jnp.log(jnp.full(2, 0.4)),
        log_mass=jnp.zeros(2),
    )
    n = 4096
    z = jax.random.normal(jax.random.key(2), (n, 2)) * 5.0  # overdispersed
    key = jax.random.key(3)
    for _ in range(10):
        key, sub = jax.random.split(key)
        z, _ = jax.jit(hmc.forward)(z, key=sub)
    np.testing.assert_allclose(np.asarray(jnp.mean(z, axis=0)), 0.5, atol=0.1)
    np.testing.assert_allclose(np.asarray(jnp.std(z, axis=0)), 1.0, rtol=0.08)


def test_metropolis_hastings_converges():
    target = distributions.DiagGaussian.create(2).replace(
        loc=jnp.array([[-1.0, 2.0]]), log_scale=jnp.zeros((1, 2))
    )
    mh = MetropolisHastings(
        target=target,
        proposal=distributions.DiagGaussianProposal.create(2, 1.0),
        steps=150,
    )
    n = 4096
    z = jnp.zeros((n, 2))
    z, _ = jax.jit(mh.forward)(z, key=jax.random.key(4))
    np.testing.assert_allclose(np.asarray(jnp.mean(z, axis=0)), [-1.0, 2.0], atol=0.12)
    np.testing.assert_allclose(np.asarray(jnp.std(z, axis=0)), 1.0, rtol=0.1)


def test_hais_estimates_known_log_normalizer():
    """HAIS importance weights: logmeanexp(log_w) -> log Z = log_const."""
    log_const = 1.7
    prior = distributions.DiagGaussian.create(2)
    target = _ShiftedGaussian(log_const=log_const)
    betas = np.linspace(1.0, 0.0, 8)
    hais = HAIS.create(
        betas, prior, target, num_leapfrog=5,
        step_size=jnp.full(2, 0.3), log_mass=jnp.zeros(2),
    )
    n = 8192
    _, log_w = jax.jit(lambda k: hais.sample(k, n))(jax.random.key(5))
    log_z = jax.nn.logsumexp(log_w) - np.log(n)
    # prior == target shape here, so weights have tiny variance; generous tol
    assert abs(float(log_z) - log_const) < 0.05, float(log_z)


def test_hmc_acceptance_sane():
    """Well-tuned HMC on a standard normal should accept 60-100% of moves."""
    target = distributions.DiagGaussian.create(2)
    hmc = HamiltonianMonteCarlo.create(
        target, steps=5, log_step_size=jnp.log(jnp.full(2, 0.2)),
        log_mass=jnp.zeros(2),
    )
    n = 4096
    z0 = target.sample(jax.random.key(6), n)
    z1, _ = jax.jit(hmc.forward)(z0, key=jax.random.key(7))
    moved = np.asarray(jnp.any(z1 != z0, axis=1)).mean()
    assert moved > 0.6, moved


def test_mh_data_dep_init_identity_transport_matches_real_kernel():
    """`MetropolisHastings.data_dep_init` is a documented identity-transport
    approximation (flows/stochastic.py): the reference's lazy ActNorm init
    would run the actual MCMC kernel on the init batch.  This pins the
    consequence: when the init batch is drawn from the kernel's own target
    (the SNF regime — the layer preserves its stationary distribution), the
    ActNorm whitening statistics from identity transport agree with those
    from a keyed real-kernel pass to MC tolerance."""
    from normflows_tpu.flows.normalization import ActNorm
    from normflows_tpu.distributions.mh_proposal import DiagGaussianProposal

    loc = jnp.array([[1.5, -0.5]])
    target = distributions.DiagGaussian.create(2).replace(loc=loc)
    mh = MetropolisHastings(
        target=target,
        proposal=DiagGaussianProposal.create(2, 0.5),
        steps=8,
    )
    x = loc + jax.random.normal(jax.random.key(0), (4096, 2))

    # identity-transport init (what init_actnorm does through the MH layer)
    _, z_identity = mh.data_dep_init(x)
    an_identity, _ = ActNorm.create(2).data_dep_init(z_identity)

    # real keyed kernel pass, then the same ActNorm init
    z_real, _ = mh.inverse(x, key=jax.random.key(1))
    an_real, _ = ActNorm.create(2).data_dep_init(z_real)

    np.testing.assert_allclose(
        np.asarray(an_identity.t), np.asarray(an_real.t), atol=0.08,
        err_msg="ActNorm shift init diverges between identity and real kernel",
    )
    np.testing.assert_allclose(
        np.asarray(an_identity.s), np.asarray(an_real.s), atol=0.08,
        err_msg="ActNorm log-scale init diverges between identity and real kernel",
    )
