"""Tensor (model-axis) and FSDP-style parameter sharding.

The reference is single-device-only (SURVEY.md §2.7); this tier is TPU-native
scale-out beyond data parallelism.  No collectives are written by hand: we
annotate *parameter placements* (Megatron column/row pattern for the wide
param-net matmuls, or FSDP largest-dim sharding) and let XLA's SPMD
partitioner insert the matching all-gathers / reduce-scatters / psums over
ICI.

Megatron pattern as applied here (per param net):

* ``MLP`` (nets/mlp.py) — ``linears`` alternate **column**-parallel (weight
  ``P(None, model)``, bias ``P(model)``) and **row**-parallel (weight
  ``P(model, None)``, bias replicated).  A (col, row) pair keeps the hidden
  activation feature-sharded between the two matmuls and ends in one psum —
  the only collective per pair.
* ``MADE`` (nets/made.py) — the residual stream stays feature-replicated at
  block boundaries: ``initial_layer``/``context_layer`` replicated (their
  in/out dims are the tiny event dims), each ``MaskedResidualBlock`` is the
  (col, row) pair ``linear_0``/``linear_1`` (the GLU context gate multiplies
  the post-psum output, so block ``context_layer`` stays replicated),
  ``MaskedFeedforwardBlock`` chains alternate col/row, and ``final_layer``
  is row-parallel (contracts the hidden dim, one psum).  The mask/degree
  buffers stay replicated — XLA slices the replicated mask against the
  sharded weight in the elementwise ``weight * mask``.
* ``ConvNet2d`` (nets/cnn.py, Glow coupling nets) — convs alternate
  **column**- (out-channel, OIHW dim 0) and **row**- (in-channel, dim 1)
  parallel; the tiny per-channel ActNorms stay replicated.
* Everything else (Lipschitz nets with power-iteration state, scalars) is
  replicated: at flow-model sizes those layers are bandwidth-trivial and
  batch sharding is the right axis for them.

A dim is only sharded when it is divisible by the model-axis size and at
least ``min_dim`` wide; otherwise that layer falls back to replicated, so
``tp_shardings`` is always safe to apply to an arbitrary model.

NOTE: tensor parallelism composes with the *unfused* MADE path only; the
opt-in fused Pallas kernel (``ops.set_made_fusion(True)``) assumes
single-device hidden activations and must stay off under a model axis (it is
off by default, ops/backend.py:46).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.module import Module, partition, _STATIC, _BUFFER

__all__ = [
    "tp_shardings",
    "fsdp_shardings",
    "make_tensor_parallel_step",
    "make_fsdp_step",
]


def _map_arrays(tree, fn):
    """Mirror ``tree``'s structure, applying ``fn(leaf, is_buffer)`` to array
    leaves (returns the same structure with ``fn``'s results at leaves)."""

    def rec(x, in_buffer):
        if isinstance(x, Module):
            obj = object.__new__(type(x))
            for f in dataclasses.fields(x):
                val = getattr(x, f.name)
                if f.metadata.get(_STATIC):
                    object.__setattr__(obj, f.name, val)
                else:
                    object.__setattr__(
                        obj, f.name,
                        rec(val, in_buffer or bool(f.metadata.get(_BUFFER))),
                    )
            return obj
        if isinstance(x, tuple):
            return type(x)(rec(v, in_buffer) for v in x)
        if isinstance(x, list):
            return [rec(v, in_buffer) for v in x]
        if isinstance(x, dict):
            return {k: rec(v, in_buffer) for k, v in x.items()}
        if x is None:
            return None
        return fn(x, in_buffer)

    return rec(tree, False)


def _linear_spec(lin, axis, size, min_dim, col):
    """(weight_spec, bias_spec) for a Linear/MaskedLinear, col- or row-parallel.

    Falls back to replicated when the sharded dim is not divisible / too
    small, so mixed-width nets degrade gracefully.
    """
    w = lin.weight
    dim = w.shape[1] if col else w.shape[0]
    if dim % size != 0 or dim < min_dim:
        return P(), P()
    if col:
        return P(None, axis), P(axis)
    return P(axis, None), P()


def _conv_spec(conv, axis, size, min_dim, col):
    """(weight_spec, bias_spec) for an OIHW Conv2d, col- (out-channel) or
    row- (in-channel) parallel; replicated fallback when indivisible."""
    w = conv.weight
    dim = w.shape[0] if col else w.shape[1]
    if dim % size != 0 or dim < min_dim:
        return P(), P()
    if col:
        return P(axis, None, None, None), P(axis)
    return P(None, axis, None, None), P()


def _tp_spec_tree(tree, axis, size, min_dim):
    """Structure-mirrored PartitionSpec tree implementing the rules above."""

    def replicated(subtree):
        return _map_arrays(subtree, lambda x, b: P())

    def rec(x):
        if isinstance(x, Module):
            name = type(x).__name__
            if name == "ConvNet2d":
                obj = object.__new__(type(x))
                for f in dataclasses.fields(x):
                    val = getattr(x, f.name)
                    if f.metadata.get(_STATIC):
                        object.__setattr__(obj, f.name, val)
                    elif f.name == "convs":
                        shards = tuple(
                            _linear_shell(c, _conv_spec(
                                c, axis, size, min_dim, col=(i % 2 == 0)))
                            for i, c in enumerate(val)
                        )
                        object.__setattr__(obj, f.name, shards)
                    else:  # actnorms: tiny per-channel params, replicated
                        object.__setattr__(obj, f.name, replicated(val))
                return obj
            if name == "MLP":
                obj = object.__new__(type(x))
                for f in dataclasses.fields(x):
                    val = getattr(x, f.name)
                    if f.metadata.get(_STATIC):
                        object.__setattr__(obj, f.name, val)
                    elif f.name == "linears":
                        shards = tuple(
                            _linear_shell(lin, _linear_spec(
                                lin, axis, size, min_dim, col=(i % 2 == 0)))
                            for i, lin in enumerate(val)
                        )
                        object.__setattr__(obj, f.name, shards)
                    else:
                        object.__setattr__(obj, f.name, replicated(val))
                return obj
            if name == "MADE":
                obj = object.__new__(type(x))
                for f in dataclasses.fields(x):
                    val = getattr(x, f.name)
                    if f.metadata.get(_STATIC):
                        object.__setattr__(obj, f.name, val)
                    elif f.name == "blocks":
                        object.__setattr__(
                            obj, f.name,
                            tuple(_made_block_spec(b, i, axis, size, min_dim)
                                  for i, b in enumerate(val)),
                        )
                    elif f.name == "final_layer":
                        object.__setattr__(obj, f.name, _linear_shell(
                            val, _linear_spec(val, axis, size, min_dim,
                                              col=False)))
                    else:  # initial_layer, context_layer, preprocessing
                        object.__setattr__(obj, f.name, replicated(val))
                return obj
            # generic module: recurse fields
            obj = object.__new__(type(x))
            for f in dataclasses.fields(x):
                val = getattr(x, f.name)
                if f.metadata.get(_STATIC):
                    object.__setattr__(obj, f.name, val)
                elif f.metadata.get(_BUFFER):
                    object.__setattr__(obj, f.name, replicated(val))
                else:
                    object.__setattr__(obj, f.name, rec(val))
            return obj
        if isinstance(x, tuple):
            return type(x)(rec(v) for v in x)
        if isinstance(x, list):
            return [rec(v) for v in x]
        if isinstance(x, dict):
            return {k: rec(v) for k, v in x.items()}
        if x is None:
            return None
        return P()  # bare array leaf outside any known net

    return rec(tree)


def _linear_shell(lin, spec_pair):
    """Spec shell for a Linear/MaskedLinear: weight/bias from ``spec_pair``,
    buffers replicated."""
    w_spec, b_spec = spec_pair
    shell = object.__new__(type(lin))
    for f in dataclasses.fields(lin):
        val = getattr(lin, f.name)
        if f.metadata.get(_STATIC):
            object.__setattr__(shell, f.name, val)
        elif f.name == "weight":
            object.__setattr__(shell, f.name, w_spec)
        elif f.name == "bias":
            object.__setattr__(shell, f.name, None if val is None else b_spec)
        else:
            object.__setattr__(shell, f.name, None if val is None else P())
    return shell


def _made_block_spec(block, index, axis, size, min_dim):
    """(col, row) pair inside a MADE block; GLU context gate replicated."""
    name = type(block).__name__
    obj = object.__new__(type(block))
    if name == "MaskedResidualBlock":
        for f in dataclasses.fields(block):
            val = getattr(block, f.name)
            if f.metadata.get(_STATIC):
                object.__setattr__(obj, f.name, val)
            elif f.name == "linear_0":
                object.__setattr__(obj, f.name, _linear_shell(
                    val, _linear_spec(val, axis, size, min_dim, col=True)))
            elif f.name == "linear_1":
                object.__setattr__(obj, f.name, _linear_shell(
                    val, _linear_spec(val, axis, size, min_dim, col=False)))
            else:  # context_layer
                object.__setattr__(
                    obj, f.name,
                    None if val is None
                    else _map_arrays(val, lambda x, b: P()))
        return obj
    if name == "MaskedFeedforwardBlock":
        for f in dataclasses.fields(block):
            val = getattr(block, f.name)
            if f.metadata.get(_STATIC):
                object.__setattr__(obj, f.name, val)
            elif f.name == "linear":
                object.__setattr__(obj, f.name, _linear_shell(
                    val, _linear_spec(val, axis, size, min_dim,
                                      col=(index % 2 == 0))))
            else:
                object.__setattr__(
                    obj, f.name,
                    None if val is None
                    else _map_arrays(val, lambda x, b: P()))
        return obj
    return _map_arrays(block, lambda x, b: P())


def tp_shardings(model, mesh: Mesh, model_axis: str = "model",
                 min_dim: int = 32):
    """NamedSharding tree for ``model`` with wide param-net matmuls sharded
    over ``model_axis`` (Megatron column/row pattern — module docstring)."""
    size = dict(zip(mesh.axis_names, mesh.devices.shape))[model_axis]
    spec_tree = _tp_spec_tree(model, model_axis, size, min_dim)
    return _map_specs_to_shardings(spec_tree, mesh)


def _map_specs_to_shardings(spec_tree, mesh):
    def rec(x):
        if isinstance(x, Module):
            obj = object.__new__(type(x))
            for f in dataclasses.fields(x):
                val = getattr(x, f.name)
                if f.metadata.get(_STATIC):
                    object.__setattr__(obj, f.name, val)
                else:
                    object.__setattr__(obj, f.name, rec(val))
            return obj
        if isinstance(x, tuple):
            return type(x)(rec(v) for v in x)
        if isinstance(x, list):
            return [rec(v) for v in x]
        if isinstance(x, dict):
            return {k: rec(v) for k, v in x.items()}
        if x is None:
            return None
        return NamedSharding(mesh, x)

    return rec(spec_tree)


def fsdp_shardings(model, mesh: Mesh, axis: str = "data",
                   min_size: int = 2 ** 14):
    """NamedSharding tree sharding each large parameter's largest divisible
    dim over ``axis`` (ZeRO-3-style: XLA all-gathers params where used and
    reduce-scatters grads).  Small leaves and buffers stay replicated."""
    size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def leaf(x, is_buffer):
        if is_buffer or not hasattr(x, "shape") or x.size < min_size:
            return NamedSharding(mesh, P())
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % size == 0 and x.shape[d] >= size:
                spec = [None] * x.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return _map_arrays(model, leaf)


def _make_sharded_param_step(model, optimizer, loss_fn, mesh, shardings,
                             donate=True):
    # jit-identity placement instead of device_put: device_put may ALIAS the
    # caller's buffers when source and target placement coincide, and the
    # donating step_fn would then delete the caller's model arrays out from
    # under them; jit without donation always materializes fresh buffers.
    model = jax.jit(lambda m: m, out_shardings=shardings)(model)
    diff, rest = partition(model)
    repl = NamedSharding(mesh, P())
    # eager optimizer.init: zeros_like moments inherit each param's
    # NamedSharding; anything else (step counters, fresh scalars) lands on a
    # single device and is re-placed replicated
    opt_state = optimizer.init(diff)
    opt_sh = jax.tree.map(
        lambda x: x.sharding
        if isinstance(getattr(x, "sharding", None), NamedSharding) else repl,
        opt_state,
    )
    opt_state = jax.device_put(opt_state, opt_sh)
    diff_sh = jax.tree.map(lambda x: x.sharding, diff)

    @partial(
        jax.jit,
        out_shardings=(diff_sh, opt_sh, repl),
        donate_argnums=(0, 1) if donate else (),
    )
    def step_fn(diff, opt_state, batch, key):
        def _loss(d):
            from ..core.module import combine
            return loss_fn(combine(d, rest), batch, key)

        loss, grads = jax.value_and_grad(_loss)(diff)
        updates, new_opt_state = optimizer.update(grads, opt_state, diff)
        new_diff = optax.apply_updates(diff, updates)
        return new_diff, new_opt_state, loss

    return step_fn, diff, rest, opt_state


def make_tensor_parallel_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable,
    mesh: Mesh,
    model_axis: str = "model",
    min_dim: int = 32,
    donate: bool = True,
):
    """Tensor-parallel training step: wide param-net matmuls sharded over
    ``model_axis``, batch sharded over the data axis by the caller
    (``shard_batch``).  Same signature contract as
    ``make_data_parallel_step``: returns ``(step_fn, diff, rest, opt_state)``
    with ``step_fn(diff, opt_state, batch, key)``."""
    sh = tp_shardings(model, mesh, model_axis, min_dim)
    return _make_sharded_param_step(model, optimizer, loss_fn, mesh, sh,
                                    donate)


def make_fsdp_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable,
    mesh: Mesh,
    axis: str = "data",
    min_size: int = 2 ** 14,
    donate: bool = True,
):
    """FSDP-style training step: large parameters (and their Adam moments)
    sharded over ``axis``; XLA inserts the all-gather-on-use /
    reduce-scatter-on-grad collectives."""
    sh = fsdp_shardings(model, mesh, axis, min_size)
    return _make_sharded_param_step(model, optimizer, loss_fn, mesh, sh,
                                    donate)
