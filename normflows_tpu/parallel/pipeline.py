"""Pipeline parallelism over flow layers (GPipe-style, TPU-native).

The reference applies its flow stack as a sequential Python loop on one
device (core.py:98); deep homogeneous stacks here can instead be *pipelined*
over a ``stage`` mesh axis: stage ``s`` holds layers
``[s*K/S, (s+1)*K/S)``, microbatches stream through the stages, and
activations hop stage→stage with ``lax.ppermute`` (one ICI neighbor
transfer per tick — the standard TPU pipelining recipe: express the
schedule, let XLA overlay compute and transfer).

Schedule: ``M`` microbatches over ``S`` stages take ``M + S - 1`` ticks;
bubble fraction ``(S-1)/(M+S-1)`` — choose ``M >= S`` (default ``2*S``).
Each tick every stage applies its local layers (a ``lax.scan`` over the
per-stage stacked params) to its current microbatch and forwards
``(activation, log_det)`` to the next stage.  Outputs are collected on the
last stage and combined with a ``psum`` (all other stages contribute
zeros), so the result is replicated — and the whole schedule is
differentiable (``ppermute``/``psum`` have transposes), so the pipeline
composes with ``jax.grad``: :func:`make_pipeline_train_step` builds a full
pipelined training step (loss + grad + optimizer update).

Restrictions: homogeneous deterministic layers (one shared pytree
structure, no ``key``), ``len(layers)`` divisible by the stage count,
batch divisible by ``num_microbatches``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.module import partition, combine

__all__ = ["make_pipeline_apply", "make_pipeline_train_step"]


def _stack_layers(layers, n_stages: int):
    """Stack a homogeneous layer list into one pytree with leading
    ``(n_stages, per_stage)`` axes on every leaf."""
    layers = list(layers)
    depth = len(layers)
    if depth % n_stages != 0:
        raise ValueError(f"{depth} layers not divisible into {n_stages} stages")
    treedefs = {jax.tree.structure(l) for l in layers}
    if len(treedefs) != 1:
        raise ValueError("pipeline requires homogeneous layers")
    per_stage = depth // n_stages
    return jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape(
            n_stages, per_stage, *jnp.shape(xs[0])), *layers)


def _make_pipeline_raw(
    mesh: Mesh,
    stage_axis: str,
    num_microbatches: Optional[int],
    reverse: bool,
):
    """Build ``run(stacked_params, z, context) -> (z, log_det)``: the
    pipelined schedule as a function OF the layer parameters, so it can sit
    under ``jax.grad`` in a training step."""
    n_stages = dict(zip(mesh.axis_names, mesh.devices.shape))[stage_axis]
    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def run_pipeline(stacked, z, context=None):
        M = num_microbatches if num_microbatches is not None else 2 * n_stages
        batch = z.shape[0]
        if batch % M != 0:
            raise ValueError(f"batch {batch} not divisible by {M} microbatches")
        mb = batch // M
        # A per-sample context (leading dim == batch) must ride the schedule
        # with its microbatch: the microbatch AT stage s on tick t is t - s,
        # so each stage indexes that row block; an unbatched/shared context
        # passes through whole.  (Closing the full context over the body
        # would pair a (mb, ...) activation with (batch, ...) context rows.)
        # per-sample contexts are (batch, C...); a 1-D context is always an
        # unbatched feature vector (MADE.context_cache_t handles those),
        # even if its length coincidentally equals the batch size
        per_sample = (
            context is not None
            and getattr(context, "ndim", 0) >= 2
            and context.shape[0] == batch
        )
        ctx_args = (context,) if context is not None else ()

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(stage_axis), P()) + (P(),) * len(ctx_args),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def run(params, z, *ctx_arg):
            ctx_full = ctx_arg[0] if ctx_arg else None
            params = jax.tree.map(lambda x: x[0], params)  # (per_stage, ...)
            stage = jax.lax.axis_index(stage_axis)
            micro = z.reshape(M, mb, *z.shape[1:])
            micro_ctx = (
                ctx_full.reshape(M, mb, *ctx_full.shape[1:])
                if per_sample else None
            )

            def tick(carry, t):
                cur, ld, outs, lds = carry
                inj = jax.lax.dynamic_index_in_dim(
                    micro, jnp.minimum(t, M - 1), keepdims=False)
                first = stage == 0
                cur = jnp.where(first, inj, cur)
                ld = jnp.where(first, jnp.zeros_like(ld), ld)
                if micro_ctx is not None:
                    ctx_t = jax.lax.dynamic_index_in_dim(
                        micro_ctx, jnp.clip(t - stage, 0, M - 1),
                        keepdims=False)
                else:
                    ctx_t = ctx_full

                def body(c, layer):
                    zz, l = c
                    if reverse:
                        zz, dl = layer.inverse(zz, ctx_t)
                    else:
                        zz, dl = layer.forward(zz, ctx_t)
                    return (zz, l + dl.astype(l.dtype)), None

                (cur, ld), _ = jax.lax.scan(body, (cur, ld), params)

                out_idx = t - (n_stages - 1)
                valid = (stage == n_stages - 1) & (out_idx >= 0)
                slot = jnp.maximum(out_idx, 0)
                outs = outs.at[slot].set(
                    jnp.where(valid, cur, outs[slot]))
                lds = lds.at[slot].set(jnp.where(valid, ld, lds[slot]))

                cur = jax.lax.ppermute(cur, stage_axis, ring)
                ld = jax.lax.ppermute(ld, stage_axis, ring)
                return (cur, ld, outs, lds), None

            cur = jnp.zeros((mb, *z.shape[1:]), z.dtype)
            ld = jnp.zeros((mb,), z.dtype)
            outs = jnp.zeros((M, mb, *z.shape[1:]), z.dtype)
            lds = jnp.zeros((M, mb), z.dtype)
            (cur, ld, outs, lds), _ = jax.lax.scan(
                tick, (cur, ld, outs, lds), jnp.arange(M + n_stages - 1))

            # only the last stage holds real outputs; psum replicates them
            last = stage == n_stages - 1
            outs = jnp.where(last, outs, jnp.zeros_like(outs))
            lds = jnp.where(last, lds, jnp.zeros_like(lds))
            outs = jax.lax.psum(outs, stage_axis)
            lds = jax.lax.psum(lds, stage_axis)
            return outs.reshape(batch, *z.shape[1:]), lds.reshape(batch)

        return run(stacked, z, *ctx_args)

    return run_pipeline


def make_pipeline_apply(
    layers,
    mesh: Mesh,
    stage_axis: str = "stage",
    num_microbatches: Optional[int] = None,
    reverse: bool = False,
):
    """Build ``apply(z, context=None) -> (z, log_det)`` running the
    homogeneous ``layers`` stack as a pipeline over ``mesh``'s
    ``stage_axis``.

    ``reverse=True`` pipelines the inverse (data->latent) direction: the
    layer order is reversed across and within stages and each stage calls
    ``layer.inverse``.
    """
    layers = list(layers)
    if reverse:
        layers = layers[::-1]
    n_stages = dict(zip(mesh.axis_names, mesh.devices.shape))[stage_axis]
    stacked = _stack_layers(layers, n_stages)
    run_pipeline = _make_pipeline_raw(mesh, stage_axis, num_microbatches, reverse)

    def apply(z, context=None):
        return run_pipeline(stacked, z, context)

    return apply


def make_pipeline_train_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    stage_axis: str = "stage",
    num_microbatches: Optional[int] = None,
    objective: str = "forward_kld",
    num_samples: int = 64,
    donate: bool = True,
):
    """Pipelined TRAINING step over ``model``'s homogeneous flow stack.

    ``objective='forward_kld'``: the density-direction (inverse) pass is
    pipelined over the stages, the base ``log_prob`` runs replicated on the
    pipeline output, and gradients flow back through the ppermute schedule
    (reference objective: core.py:87-102).  ``objective='reverse_kld'``:
    base sampling + pipelined forward pass + target log-prob
    (core.py:104-131, score-function estimator).

    Layer parameters live stage-sharded (leading stage axis placed over
    ``stage_axis``), so each device holds only its own stages' layers and
    their optimizer moments.  Returns
    ``(step_fn, diff, (rest_stack, rest_shell), opt_state)`` with
    ``step_fn(diff, opt_state, batch, key) -> (diff, opt_state, loss)`` and
    ``diff = {"stack": ..., "shell": ...}`` (stage-stacked layer params +
    replicated base/target params; note ``rest`` is the two matching
    non-trainable parts, NOT a tree combinable with ``nf.combine(diff,
    rest)`` directly).  For ``reverse_kld`` pass ``batch=None``.
    """
    if objective not in ("forward_kld", "reverse_kld"):
        raise ValueError(f"unknown objective {objective!r}")
    reverse = objective == "forward_kld"
    layers = list(model.flows)
    if reverse:
        layers = layers[::-1]
    n_stages = dict(zip(mesh.axis_names, mesh.devices.shape))[stage_axis]
    stacked = _stack_layers(layers, n_stages)
    run_pipeline = _make_pipeline_raw(mesh, stage_axis, num_microbatches, reverse)

    # stage-shard the stacked layer params (leading axis = stage) and keep
    # the (small) base distribution + target replicated
    stage_sh = jax.tree.map(
        lambda x: NamedSharding(
            mesh, P(stage_axis, *([None] * (x.ndim - 1)))),
        stacked,
    )
    repl = NamedSharding(mesh, P())
    stacked = jax.jit(lambda t: t, out_shardings=stage_sh)(stacked)
    shell = model.replace(flows=())  # q0 + p, replicated
    shell = jax.jit(lambda t: t, out_shardings=repl)(shell)

    diff_stack, rest_stack = partition(stacked)
    diff_shell, rest_shell = partition(shell)
    diff = {"stack": diff_stack, "shell": diff_shell}
    opt_state = optimizer.init(diff)
    # moments inherit param shardings from optimizer.init's zeros_like;
    # scalars (counts) land single-device — re-place them replicated
    opt_state = jax.device_put(
        opt_state,
        jax.tree.map(
            lambda x: x.sharding
            if isinstance(getattr(x, "sharding", None), NamedSharding) else repl,
            opt_state,
        ),
    )

    def _loss(diff, batch, key):
        stack = combine(diff["stack"], rest_stack)
        sh = combine(diff["shell"], rest_shell)
        if objective == "forward_kld":
            z, log_det = run_pipeline(stack, batch)
            log_q = log_det + sh.q0.log_prob(z)
            return -jnp.mean(log_q)
        z, log_q = sh.q0.sample_and_log_prob(key, num_samples)
        z, log_det = run_pipeline(stack, z)
        log_q = log_q - log_det
        return jnp.mean(log_q) - jnp.mean(sh.p.log_prob(z))

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step_fn(diff, opt_state, batch, key):
        loss, grads = jax.value_and_grad(_loss)(diff, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    return step_fn, diff, (rest_stack, rest_shell), opt_state
