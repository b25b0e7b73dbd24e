"""Model export for production serving (no reference counterpart).

The reference deploys by unpickling a torch module and running Python
(core.py:199-214 ``save``/``load``); the TPU-native serving path instead
freezes a
trained flow into **serialized StableHLO executables** via ``jax.export``:
parameters are baked in as constants, the artifact is a self-contained
bytestring that any later JAX process (same or newer jaxlib, any supported
platform it was exported for) can deserialize and call — no model code, no
pickle, no Python class versioning.

Two entry points are exported per model:

* ``sample(seed)`` — ``num_samples`` draws plus their log-probs from one
  ``uint32`` seed (keys are created inside the graph, so the serving
  surface is plain arrays only);
* ``log_prob(x)`` — densities for a data batch; the batch dim is exported
  **symbolically** (``jax.export.symbolic_shape``), so one artifact serves
  any batch size.

Use :func:`save_bundle` / :func:`load_bundle` for a directory layout with a
JSON manifest, or :func:`export_sampler` / :func:`export_log_prob` for the
raw ``jax.export.Exported`` objects.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = [
    "export_sampler",
    "export_log_prob",
    "save_bundle",
    "load_bundle",
]


def _platforms(platforms):
    if platforms is None:
        return None  # default: current backend
    return tuple(platforms)


def export_sampler(
    model,
    num_samples: int,
    platforms: Optional[Sequence[str]] = None,
    class_cond: bool = False,
):
    """Export ``seed -> (samples, log_q)`` with params baked in.

    ``seed`` is a uint32 scalar; the PRNG key is built inside the graph so
    the exported calling convention is arrays-only.  With
    ``class_cond=True`` (class-conditional models: MultiscaleFlow with
    class-cond bases, ClassCondFlow) the endpoint is
    ``(seed, y) -> (samples, log_q)`` with ``y`` an int32 label vector of
    length ``num_samples``.
    """
    seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)
    if class_cond:
        def sample(seed, y):
            return model.sample(jax.random.key(seed), num_samples, y)

        y_spec = jax.ShapeDtypeStruct((num_samples,), jnp.int32)
        return jax_export.export(
            jax.jit(sample), platforms=_platforms(platforms))(seed_spec, y_spec)

    def sample(seed):
        key = jax.random.key(seed)
        if hasattr(model, "sample_and_log_prob"):
            return model.sample_and_log_prob(key, num_samples)
        # MultiscaleFlow/ClassCondFlow expose the same (x, log_q) pair
        # directly through sample() (core/facades.py) — unconditional
        # multiscale (Glow) models must export too
        return model.sample(key, num_samples)

    return jax_export.export(
        jax.jit(sample), platforms=_platforms(platforms))(seed_spec)


def export_log_prob(
    model,
    event_shape: Sequence[int],
    platforms: Optional[Sequence[str]] = None,
    symbolic_batch: bool = True,
    class_cond: bool = False,
    batch_size: Optional[int] = None,
):
    """Export ``x -> log_prob(x)`` (or ``(x, y) ->`` when class-cond) with a
    symbolic batch dimension shared by ``x`` and ``y``.

    ``symbolic_batch=False`` + ``batch_size`` exports a CONCRETE-batch
    artifact.  For the AR spline models this matters on TPU: concrete
    shapes take the fused Pallas spline path inside the exported program,
    symbolic ones fall back to the jnp path (~26x slower at flagship
    shapes; measured in docs/serving.md) — the flexibility tax of a
    shape-polymorphic artifact."""
    if symbolic_batch:
        if batch_size is not None:
            raise ValueError(
                "batch_size only applies with symbolic_batch=False — a"
                " symbolic-batch export would silently drop it and take the"
                " slow general spline path (docs/serving.md)."
            )
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch_size if batch_size is not None else 1
    x_spec = jax.ShapeDtypeStruct((b, *event_shape), jnp.float32)
    if class_cond:
        y_spec = jax.ShapeDtypeStruct((b,), jnp.int32)
        return jax_export.export(
            jax.jit(model.log_prob), platforms=_platforms(platforms))(
                x_spec, y_spec)
    return jax_export.export(
        jax.jit(model.log_prob), platforms=_platforms(platforms))(x_spec)


def save_bundle(
    model,
    path: str,
    num_samples: int,
    event_shape: Sequence[int],
    platforms: Optional[Sequence[str]] = None,
    symbolic_batch: bool = True,
    class_cond: bool = False,
    batch_size: Optional[int] = None,
):
    """Write a serving bundle: ``sample.bin``, ``log_prob.bin``,
    ``manifest.json`` under ``path``.  See :func:`export_log_prob` for the
    ``symbolic_batch`` / ``batch_size`` performance trade-off."""
    os.makedirs(path, exist_ok=True)
    smp = export_sampler(model, num_samples, platforms, class_cond=class_cond)
    lp = export_log_prob(model, event_shape, platforms, symbolic_batch,
                         class_cond=class_cond, batch_size=batch_size)
    with open(os.path.join(path, "sample.bin"), "wb") as f:
        f.write(smp.serialize())
    with open(os.path.join(path, "log_prob.bin"), "wb") as f:
        f.write(lp.serialize())
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(
            {
                "num_samples": num_samples,
                "event_shape": list(event_shape),
                "platforms": list(smp.platforms),
                "symbolic_batch": symbolic_batch,
                "class_cond": class_cond,
                "calling_convention_version":
                    smp.calling_convention_version,
            },
            f,
            indent=2,
        )


class ServingBundle:
    """Deserialized serving endpoints: ``.sample(seed)``, ``.log_prob(x)``."""

    def __init__(self, sample_exp, log_prob_exp, manifest):
        self._sample = sample_exp
        self._log_prob = log_prob_exp
        self.manifest = manifest

    def _check_y(self, y, method):
        if self.manifest.get("class_cond"):
            if y is None:
                raise ValueError(
                    f"this bundle was exported with class_cond=True; "
                    f"{method} requires a label vector y")
            return True
        if y is not None:
            raise ValueError(
                f"this bundle is unconditional; {method} does not accept y "
                "(re-export with class_cond=True for conditional endpoints)")
        return False

    def sample(self, seed: int, y=None):
        seed = jnp.asarray(seed, jnp.uint32)
        if self._check_y(y, "sample"):
            return self._sample.call(seed, jnp.asarray(y, jnp.int32))
        return self._sample.call(seed)

    def log_prob(self, x, y=None):
        x = jnp.asarray(x, jnp.float32)
        if self._check_y(y, "log_prob"):
            return self._log_prob.call(x, jnp.asarray(y, jnp.int32))
        return self._log_prob.call(x)


def load_bundle(path: str) -> ServingBundle:
    """Load a bundle written by :func:`save_bundle`; no model code needed."""
    with open(os.path.join(path, "sample.bin"), "rb") as f:
        smp = jax_export.deserialize(f.read())
    with open(os.path.join(path, "log_prob.bin"), "rb") as f:
        lp = jax_export.deserialize(f.read())
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    return ServingBundle(smp, lp, manifest)
