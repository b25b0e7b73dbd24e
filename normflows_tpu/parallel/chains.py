"""Chain/particle parallelism for SNF, HMC and HAIS.

The reference advances all chains in lockstep inside one batch tensor
(stochastic.py:31-44); here the chain axis is additionally sharded over the
mesh so N-chip slices run N× the chains at constant wall-clock.  Per-chain
PRNG comes from one key via ``jax.random.split`` (deterministic regardless of
sharding layout).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
from jax.sharding import Mesh

from .mesh import replicate, shard_batch, batch_sharding


def shard_chains(z, mesh: Mesh, axis: str = "data"):
    """Shard the chain (leading) axis of a state tensor across the mesh
    (the chain axis IS a batch axis — same placement as mesh.shard_batch)."""
    return shard_batch(z, mesh, axis)


def parallel_chain_sample(
    sampler,
    mesh: Mesh,
    num_samples: int,
    axis: str = "data",
):
    """Jitted sharded sampling: ``sampler.sample(key, n) -> (samples, log_w)``.

    The batch/chain axis of the output is sharded over ``axis``; all the MCMC
    arithmetic inside is elementwise/batched, so XLA runs it fully
    parallel with zero communication until the caller reduces the weights.
    Returns ``run(key) -> (samples, log_weights)``.
    """
    sampler = replicate(sampler, mesh)

    @partial(jax.jit, static_argnums=())
    def run(key):
        samples, log_w = sampler.sample(key, num_samples)
        samples = jax.lax.with_sharding_constraint(
            samples, batch_sharding(mesh, samples.ndim, axis))
        log_w = jax.lax.with_sharding_constraint(
            log_w, batch_sharding(mesh, 1, axis))
        return samples, log_w

    return run
