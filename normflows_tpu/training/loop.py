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
    donate: bool = False,
):
    """Build (state, step_fn).

    ``loss_fn(model, batch, key) -> scalar``.  ``step_fn(state, batch, key)``
    returns (state, metrics).  Non-finite losses are skipped — the whole
    optimizer step (updates AND optimizer-state advance) is masked out,
    mirroring the reference notebooks' ``~(isnan|isinf)`` loss-skip idiom
    (e.g. examples/glow.ipynb train cell).

    If ``update_lipschitz_iters`` is set, power iteration runs on every
    induced-norm layer after the update (examples/residual.ipynb pattern).
    ``donate=True`` donates the state buffers to the step (no per-step copy
    of params + optimizer moments in HBM, like the parallel factories);
    leave False if you need the previous state after calling step_fn.
    """
    diff, rest = partition(model)
    state = TrainState(diff, rest, optimizer.init(diff), jnp.zeros((), jnp.int32))

    def step_fn(state: TrainState, batch, key):
        def _loss(d):
            return loss_fn(combine(d, state.rest), batch, key)

        loss, grads = jax.value_and_grad(_loss)(state.diff)
        finite = jnp.isfinite(loss)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.diff)
        # Skip the WHOLE optimizer step on a non-finite loss: masking only
        # the gradients is not enough under momentum optimizers (Adam's
        # updates = -lr*m_hat/... is nonzero even for zero grads, and the
        # moments/count would still advance) — mask the applied updates AND
        # keep the previous optimizer state, like the reference notebooks'
        # `if not (isnan | isinf): loss.backward(); optimizer.step()` idiom
        # (examples/glow.ipynb train cell).
        updates = jax.tree.map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates
        )
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old)
            if isinstance(new, jax.Array) else new,
            opt_state, state.opt_state,
        )
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

    return state, jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_chunked_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable,
    data,
    batch_size: int,
    chunk_len: int = 10,
    shuffle: bool = True,
    update_lipschitz_iters: Optional[int] = None,
    donate: bool = True,
):
    """Device-resident-data training: ``chunk_len`` steps per dispatch.

    The reference idiom — slice a host array, transfer, run one step —
    pays a host->device transfer and a dispatch per iteration; on a
    remote/tunneled chip that round-trip can exceed the step itself (a 6 MB
    CIFAR batch per iteration was measured slower than the compute here).
    This factory instead places the ENTIRE dataset in device memory once
    (CIFAR-10 in f32 is ~614 MB — small next to 16 GB HBM) and runs
    ``chunk_len`` optimizer steps inside one ``lax.scan`` per call, with
    per-step minibatches gathered ON DEVICE: ``shuffle=True`` draws i.i.d.
    uniform index vectors with the step's PRNG key — sampling WITH
    replacement, so a batch may contain duplicate rows and an "epoch" is not
    a permutation of the dataset (the i.i.d.-SGD regime, not epoch
    shuffling); ``shuffle=False`` slides a sequential window.

    ``data`` is an array or tuple of arrays with a common leading dim (e.g.
    ``(x, y)``); ``loss_fn(model, batch, key)`` receives the same structure
    per minibatch.  Returns ``(state, chunk_fn)`` with
    ``chunk_fn(state, key) -> (state, metrics)`` where metrics hold the
    per-step loss trace of the chunk (shape ``(chunk_len,)``).
    """
    data = tuple(data) if isinstance(data, (tuple, list)) else (data,)
    n = data[0].shape[0]
    if batch_size > n:
        raise ValueError(f"batch_size {batch_size} exceeds dataset size {n}")
    data = tuple(jax.device_put(d) for d in data)
    single = len(data) == 1

    if donate:
        # the donating chunk consumes its state buffers, and models also
        # legitimately alias leaves (e.g. one mask array shared by
        # alternating coupling layers, which would donate a buffer twice):
        # take a fresh private copy of every leaf once, so the caller's
        # arrays survive and no buffer appears twice
        model = jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, model
        )

    state, step_fn = make_train_step(
        model, optimizer, loss_fn, update_lipschitz_iters
    )

    def chunk_fn(state: TrainState, key):
        def body(carry, _):
            state, key = carry
            key, k_batch, k_step = jax.random.split(key, 3)
            if shuffle:
                idx = jax.random.randint(k_batch, (batch_size,), 0, n)
            else:
                start = (state.step * batch_size) % (n - batch_size + 1)
                idx = start + jnp.arange(batch_size)
            batch = tuple(jnp.take(d, idx, axis=0) for d in data)
            batch = batch[0] if single else batch
            state, metrics = step_fn(state, batch, k_step)
            return (state, key), metrics["loss"]

        (state, key), losses = jax.lax.scan(
            body, (state, key), None, length=chunk_len
        )
        return state, {"loss": losses}

    return state, jax.jit(chunk_fn, donate_argnums=(0,) if donate else ())
