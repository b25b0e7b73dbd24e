"""Data-parallel training steps.

Replaces the reference notebooks' single-device ``loss.backward()`` loops
(SURVEY.md §2.7) with one jitted step: batch sharded over the ``data`` mesh
axis, parameters replicated, gradient allreduce inserted by XLA (riding ICI).
No explicit collectives are written — sharding annotations + jit are the
TPU-native NCCL.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.module import partition, combine
from .mesh import replicate, shard_batch


def make_data_parallel_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable,
    mesh: Mesh,
    donate: bool = True,
):
    """Build (step_fn, diff, rest, opt_state) for data-parallel training.

    ``loss_fn(model, batch, key) -> scalar``.  Returns a jitted
    ``step_fn(diff, opt_state, batch, key) -> (diff, opt_state, loss)`` with
    parameters replicated and ``batch`` sharded on its leading axis.
    Shard batches with ``shard_batch(x, mesh)`` before passing them in.
    """
    diff, rest = partition(model)
    diff = replicate(diff, mesh)
    rest = replicate(rest, mesh)
    opt_state = replicate(optimizer.init(diff), mesh)

    repl = NamedSharding(mesh, P())

    @partial(
        jax.jit,
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )
    def step_fn(diff, opt_state, batch, key):
        def _loss(d):
            return loss_fn(combine(d, rest), batch, key)

        loss, grads = jax.value_and_grad(_loss)(diff)
        updates, new_opt_state = optimizer.update(grads, opt_state, diff)
        new_diff = optax.apply_updates(diff, updates)
        return new_diff, new_opt_state, loss

    return step_fn, diff, rest, opt_state


def make_reverse_kld_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    num_samples: int,
    axis: str = "data",
    beta: float = 1.0,
    score_fn: bool = True,
    donate: bool = True,
):
    """Data-parallel reverse-KLD training step (the flagship objective).

    Unlike ``make_data_parallel_step`` there is no input batch to shard —
    reverse KLD *samples* its batch inside the step — so the sampled-z axis is
    pinned to the mesh via a sharding constraint (facades.reverse_kld
    ``z_sharding``).  With JAX's partitionable threefry, the generated samples
    are bit-identical regardless of mesh size, so the sharded loss exactly
    equals the single-device loss.

    Returns ``(step_fn, diff, rest, opt_state)`` with
    ``step_fn(diff, opt_state, key) -> (diff, opt_state, loss)``.
    """
    diff, rest = partition(model)
    diff = replicate(diff, mesh)
    rest = replicate(rest, mesh)
    opt_state = replicate(optimizer.init(diff), mesh)

    repl = NamedSharding(mesh, P())
    z_sharding = NamedSharding(mesh, P(axis))

    @partial(
        jax.jit,
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )
    def step_fn(diff, opt_state, key):
        def _loss(d):
            return combine(d, rest).reverse_kld(
                key, num_samples, beta=beta, score_fn=score_fn,
                z_sharding=z_sharding,
            )

        loss, grads = jax.value_and_grad(_loss)(diff)
        updates, new_opt_state = optimizer.update(grads, opt_state, diff)
        new_diff = optax.apply_updates(diff, updates)
        return new_diff, new_opt_state, loss

    return step_fn, diff, rest, opt_state


def make_eval_step(model, eval_fn: Callable, mesh: Mesh):
    """Jitted data-parallel evaluation: ``eval_fn(model, batch) -> per-batch``."""
    diff, rest = partition(model)
    diff = replicate(diff, mesh)
    rest = replicate(rest, mesh)

    @jax.jit
    def step_fn(diff, batch):
        return eval_fn(combine(diff, rest), batch)

    return step_fn, diff, rest
