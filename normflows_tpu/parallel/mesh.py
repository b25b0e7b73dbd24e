"""Device mesh construction and sharding helpers.

Axis convention: ``data`` is the batch/sample axis (data parallelism over
ICI), ``chain`` is the MCMC-chain/particle axis.  Model parameters are
replicated (flows are small relative to HBM; batch work dominates), so the
only collective in the training step is the gradient allreduce XLA inserts
for the mean over the sharded batch — which rides ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_shapes: Optional[dict] = None, devices=None) -> Mesh:
    """Build a Mesh; default: all devices on one ``data`` axis.

    ``axis_shapes`` e.g. {"data": 4, "chain": 2}; -1 means "fill with the
    remaining devices".
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_shapes is None:
        axis_shapes = {"data": n}
    names = tuple(axis_shapes.keys())
    sizes = list(axis_shapes.values())
    n_fixed = int(np.prod([s for s in sizes if s != -1]))
    sizes = [n // n_fixed if s == -1 else s for s in sizes]
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place a batched array with its leading dim sharded over ``axis``."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (model/opt state) across the mesh.

    Placement goes through a jit identity rather than ``device_put``:
    device_put may ALIAS the caller's buffers when source and target
    placement coincide, and a later donating step would then delete the
    caller's arrays out from under them; jit without donation always
    materializes fresh buffers.
    """
    sharding = NamedSharding(mesh, P())
    return jax.jit(lambda t: t, out_shardings=sharding)(tree)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))
