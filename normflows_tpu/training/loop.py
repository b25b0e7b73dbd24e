"""Training-step factory: the library-side replacement for the reference's
user-written notebook loops (SURVEY.md §1 'examples are the de-facto training
harness').  Returns a jitted step with metrics; composes with
parallel.make_data_parallel_step for sharded training.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.module import partition, combine


class TrainState(NamedTuple):
    diff: Any  # trainable leaves
    rest: Any  # buffers + frozen leaves
    opt_state: Any
    step: jnp.ndarray

    @property
    def model(self):
        return combine(self.diff, self.rest)


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable,
    update_lipschitz_iters: Optional[int] = None,
):
    """Build (state, step_fn).

    ``loss_fn(model, batch, key) -> scalar``.  ``step_fn(state, batch, key)``
    returns (state, metrics).  Non-finite losses are skipped — the parameter
    update is masked out, mirroring the reference notebooks' ``~(isnan|isinf)``
    loss-skip idiom (e.g. examples/glow.ipynb train cell).

    If ``update_lipschitz_iters`` is set, power iteration runs on every
    induced-norm layer after the update (examples/residual.ipynb pattern).
    """
    diff, rest = partition(model)
    state = TrainState(diff, rest, optimizer.init(diff), jnp.zeros((), jnp.int32))

    def step_fn(state: TrainState, batch, key):
        def _loss(d):
            return loss_fn(combine(d, state.rest), batch, key)

        loss, grads = jax.value_and_grad(_loss)(state.diff)
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.diff)
        diff = optax.apply_updates(state.diff, updates)
        rest = state.rest
        if update_lipschitz_iters is not None:
            from ..utils.optim import update_lipschitz
            from ..core.module import partition as _part

            m = update_lipschitz(combine(diff, rest), update_lipschitz_iters)
            diff, rest = _part(m)
        new_state = TrainState(diff, rest, opt_state, state.step + 1)
        metrics = {"loss": loss, "finite": finite}
        return new_state, metrics

    return state, jax.jit(step_fn)
