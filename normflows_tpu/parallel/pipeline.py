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
composes with ``jax.grad`` for training.

Restrictions: homogeneous deterministic layers (one shared pytree
structure, no ``key``), ``len(layers)`` divisible by the stage count,
batch divisible by ``num_microbatches``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

__all__ = ["make_pipeline_apply"]


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
    depth = len(layers)
    if depth % n_stages != 0:
        raise ValueError(
            f"{depth} layers not divisible into {n_stages} stages")
    treedefs = {jax.tree.structure(l) for l in layers}
    if len(treedefs) != 1:
        raise ValueError("pipeline requires homogeneous layers")
    per_stage = depth // n_stages
    # leading axis (S, per_stage): stage s holds its contiguous layer block
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape(
            n_stages, per_stage, *jnp.shape(xs[0])), *layers)

    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def apply(z, context=None):
        M = num_microbatches if num_microbatches is not None else 2 * n_stages
        batch = z.shape[0]
        if batch % M != 0:
            raise ValueError(f"batch {batch} not divisible by {M} microbatches")
        mb = batch // M

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(stage_axis), P()),
            out_specs=(P(), P()),
            check_rep=False,
        )
        def run(params, z):
            params = jax.tree.map(lambda x: x[0], params)  # (per_stage, ...)
            stage = jax.lax.axis_index(stage_axis)
            micro = z.reshape(M, mb, *z.shape[1:])

            def tick(carry, t):
                cur, ld, outs, lds = carry
                inj = jax.lax.dynamic_index_in_dim(
                    micro, jnp.minimum(t, M - 1), keepdims=False)
                first = stage == 0
                cur = jnp.where(first, inj, cur)
                ld = jnp.where(first, jnp.zeros_like(ld), ld)

                def body(c, layer):
                    zz, l = c
                    if reverse:
                        zz, dl = layer.inverse(zz, context)
                    else:
                        zz, dl = layer.forward(zz, context)
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

        return run(stacked, z)

    return apply
