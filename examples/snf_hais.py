"""Stochastic normalizing flow + Hamiltonian annealed importance sampling
(reference: normflows/sampling/hais.py + flows/stochastic.py; the SNF paper
setup arXiv:2002.06707).

Builds an SNF interleaving deterministic coupling layers with MCMC layers,
then runs HAIS to estimate a normalizing constant / posterior moments, with
chains sharded over all local devices.

Run:  python examples/snf_hais.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import normflows_tpu as nf
from normflows_tpu import flows, distributions, parallel
from normflows_tpu.nets import MLP
from normflows_tpu.sampling import HAIS
from normflows_tpu.utils import enable_compilation_cache


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    target = distributions.TwoMoons()

    # --- SNF: couple deterministic + MCMC layers --------------------------
    b = jnp.array([1.0, 0.0])
    layers = []
    for i in range(4):
        k1, k2 = jax.random.split(jax.random.key(i))
        s = MLP.create(k1, [2, 64, 2], init_zeros=True)
        t = MLP.create(k2, [2, 64, 2], init_zeros=True)
        layers.append(
            flows.MaskedAffineFlow.create(b if i % 2 == 0 else 1 - b, t=t, s=s)
        )
        layers.append(
            flows.MetropolisHastings(
                target=target,
                proposal=distributions.DiagGaussianProposal.create((2,), 0.3),
                steps=5,
            )
        )
    snf = nf.NormalizingFlow.create(
        distributions.DiagGaussian.create(2), layers, p=target
    )
    z, log_q = snf.sample(jax.random.key(0), 1024)
    print("SNF samples:", z.shape, "mean |z|:",
          float(jnp.mean(jnp.linalg.norm(z, axis=1))))

    # --- HAIS with chain sharding over the local mesh ---------------------
    prior = distributions.DiagGaussian.create(2)
    betas = np.linspace(1.0, 0.0, 32)
    hais = HAIS.create(
        betas, prior, target, num_leapfrog=10,
        step_size=jnp.full(2, 0.2), log_mass=jnp.zeros(2),
    )
    mesh = parallel.make_mesh()
    n_chains = 4096
    run = parallel.parallel_chain_sample(hais, mesh, n_chains)
    t0 = time.time()
    samples, log_w = run(jax.random.key(1))
    jax.block_until_ready(samples)
    dt = time.time() - t0
    # log normalizing constant of the unnormalized target density
    log_z = jax.scipy.special.logsumexp(log_w) - np.log(n_chains)
    w = jax.nn.softmax(log_w)
    ess = 1.0 / jnp.sum(w**2)
    print(f"HAIS: {n_chains} chains x {len(betas) - 2} HMC stages in {dt:.2f}s "
          f"({n_chains * (len(betas) - 2) * 10 / dt:.0f} leapfrog-chain-steps/s)")
    print(f"log Z estimate: {float(log_z):.4f}   ESS: {float(ess):.0f}")
    mean_est = jnp.sum(w[:, None] * samples, axis=0)
    print("posterior mean estimate:", np.asarray(mean_est))


if __name__ == "__main__":
    main()
