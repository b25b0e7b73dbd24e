"""Minimal pytree module system for TPU-native normalizing flows.

Design: every model component is an immutable (frozen) dataclass registered as a
JAX pytree.  Array-valued fields are pytree leaves (parameters / buffers); fields
declared with ``static_field()`` are auxiliary (hashable) metadata that shape the
computation at trace time.  This replaces the reference's stateful
``torch.nn.Module`` tree (``/root/reference/normflows/flows/base.py:5-24``) with a
pure-functional design: parameters live *inside* the model pytree, so the whole
model can be passed through ``jax.jit`` / ``jax.grad`` / ``jax.vmap`` and updated
functionally with ``dataclasses.replace``.

Buffers (non-trained arrays such as permutation indices, LU pivot matrices,
power-iteration vectors) are declared with ``buffer_field()``; ``partition``
excludes them (and all non-inexact leaves) from the differentiable part.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

_STATIC = "nf_static"
_BUFFER = "nf_buffer"


def static_field(**kwargs):
    """Field holding hashable config (pytree aux data, not a leaf)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata[_STATIC] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def buffer_field(**kwargs):
    """Field holding a non-trainable array leaf (still a pytree leaf)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata[_BUFFER] = True
    return dataclasses.field(metadata=metadata, **kwargs)


class Module:
    """Base class: subclasses become frozen-dataclass pytrees automatically."""

    _data_fields: tuple = ()
    _static_fields: tuple = ()

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        dataclasses.dataclass(cls, frozen=True, eq=False, repr=False, kw_only=True)
        data_fields, static_fields = [], []
        for f in dataclasses.fields(cls):
            if f.metadata.get(_STATIC):
                static_fields.append(f.name)
            else:
                data_fields.append(f.name)
        cls._data_fields = tuple(data_fields)
        cls._static_fields = tuple(static_fields)

        def flatten_with_keys(obj, _cls=cls):
            children = [
                (jax.tree_util.GetAttrKey(name), getattr(obj, name))
                for name in _cls._data_fields
            ]
            aux = tuple(getattr(obj, name) for name in _cls._static_fields)
            return children, aux

        def flatten(obj, _cls=cls):
            children = [getattr(obj, name) for name in _cls._data_fields]
            aux = tuple(getattr(obj, name) for name in _cls._static_fields)
            return children, aux

        def unflatten(aux, children, _cls=cls):
            obj = object.__new__(_cls)
            for name, val in zip(_cls._data_fields, children):
                object.__setattr__(obj, name, val)
            for name, val in zip(_cls._static_fields, aux):
                object.__setattr__(obj, name, val)
            return obj

        jax.tree_util.register_pytree_with_keys(
            cls, flatten_with_keys, unflatten, flatten_func=flatten
        )

    def replace(self, **changes) -> "Module":
        return dataclasses.replace(self, **changes)

    def __repr__(self):
        names = ", ".join(self._static_fields)
        return f"{type(self).__name__}({names})"


def _is_inexact(x) -> bool:
    try:
        return jnp.issubdtype(jnp.result_type(x), jnp.inexact)
    except TypeError:
        return False


def trainable_filter(tree) -> Any:
    """Pytree of bools with the same structure: True at trainable leaves.

    A leaf is trainable iff it is an inexact (float/complex) array and no
    enclosing field was declared as a buffer.
    """

    def rec(x, in_buffer):
        if isinstance(x, Module):
            # A Module may declare a static field ``trainable``; when it is
            # the literal bool False, all its array leaves (recursively) are
            # treated as buffers — the functional analogue of the reference
            # registering loc/scale as fixed buffers for ``trainable=False``
            # (base.py:62-72).  Only a scalar bool engages the convention
            # (python or numpy bool — config files produce np.False_): a
            # user Module with an unrelated (e.g. array-valued) field named
            # ``trainable`` must neither crash nor silently freeze.
            t = getattr(x, "trainable", True)
            frozen = isinstance(t, (bool, np.bool_)) and not t
            obj = object.__new__(type(x))
            for f in dataclasses.fields(x):
                val = getattr(x, f.name)
                if f.metadata.get(_STATIC):
                    object.__setattr__(obj, f.name, val)
                else:
                    object.__setattr__(
                        obj,
                        f.name,
                        rec(val, in_buffer or frozen or bool(f.metadata.get(_BUFFER))),
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
        return (not in_buffer) and _is_inexact(x)

    return rec(tree, False)


def partition(tree):
    """Split ``tree`` into (diff, rest): trainable leaves vs everything else.

    ``diff`` has None at non-trainable leaves (None prunes the subtree for JAX),
    so ``jax.grad`` over ``diff`` only differentiates trainable parameters.
    Reassemble with :func:`combine`.
    """
    spec = trainable_filter(tree)
    diff = jax.tree.map(lambda x, m: x if m else None, tree, spec)
    rest = jax.tree.map(lambda x, m: None if m else x, tree, spec)
    return diff, rest


def combine(diff, rest):
    """Inverse of :func:`partition`."""
    return jax.tree.map(
        lambda a, b: b if a is None else a,
        diff,
        rest,
        is_leaf=lambda x: x is None,
    )


def apply_updates(tree, updates):
    """Apply (possibly None-pruned) additive updates to matching leaves."""
    return jax.tree.map(
        lambda u, p: p if u is None else p + u,
        updates,
        tree,
        is_leaf=lambda x: x is None,
    )


def tree_size(tree) -> int:
    """Total number of scalar elements across array leaves."""
    return sum(
        x.size for x in jax.tree.leaves(tree) if hasattr(x, "size")
    )
