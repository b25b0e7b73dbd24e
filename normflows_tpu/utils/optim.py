"""Optimizer-adjacent helpers (reference: normflows/utils/optim.py:4-31).

``set_requires_grad`` / ``clear_grad`` have no functional-JAX counterpart
(gradients are values, trainability is an optimizer mask — see
core.module.partition); ``update_lipschitz`` is the load-bearing one: the
residual-flow training loop calls it after every optimizer step
(examples/residual.ipynb train cell).
"""

from __future__ import annotations

import dataclasses

import jax

from ..core.module import Module


def set_requires_grad(model, flag: bool):
    """API-parity stub for utils/optim.py:4-14.

    JAX has no in-place grad flags; trainability is expressed through
    ``core.module.partition`` / optimizer masks.  Returns the model unchanged.
    """
    return model


def clear_grad(model):
    """API-parity stub for utils/optim.py:17-25 — gradients are values in JAX."""
    return model


def update_lipschitz(model, n_iterations: int = 50):
    """Re-run power iteration on every induced-norm layer; returns new model.

    Functional equivalent of utils/optim.py:28-31.  Safe to wrap in jax.jit.
    """
    from ..nets.lipschitz import InducedNormLinear, InducedNormConv2d

    def rec(x):
        if isinstance(x, (InducedNormLinear, InducedNormConv2d)):
            return x.update_power_iteration(n_iterations=n_iterations)
        if isinstance(x, Module):
            changes = {}
            for f in dataclasses.fields(x):
                if f.metadata.get("nf_static"):
                    continue
                val = getattr(x, f.name)
                new_val = rec(val)
                if new_val is not val:
                    changes[f.name] = new_val
            return x.replace(**changes) if changes else x
        if isinstance(x, tuple):
            return tuple(rec(v) for v in x)
        if isinstance(x, list):
            return [rec(v) for v in x]
        if isinstance(x, dict):
            return {k: rec(v) for k, v in x.items()}
        return x

    return rec(model)
