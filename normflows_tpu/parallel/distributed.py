"""Multi-host execution helpers.

ICI within a slice, DCN across hosts; ``jax.distributed.initialize`` wires the
processes, after which the global mesh spans every chip and the sharded train
steps in data_parallel.py work unchanged — XLA routes the gradient allreduce
hierarchically (intra-slice ICI, inter-slice DCN).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize multi-host JAX.  No-ops on single-process setups.

    On TPU pods the arguments are auto-detected from the environment (the
    no-argument path, where a failed auto-detect is tolerated and means
    single-process).  With an explicit ``coordinator_address`` the caller has
    asserted a cluster exists, so initialization errors PROPAGATE — silently
    training on 1/N of the data is the worst possible failure mode.
    """
    # NB: must not touch the XLA backend (jax.devices/process_count) before
    # jax.distributed.initialize — that pins a single-process backend.
    if jax.distributed.is_initialized():
        return
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process environment (e.g. local CPU testing)
        pass


def process_local_batch(global_batch_size: int) -> int:
    """Per-host batch size: each host loads only its shard of the data."""
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n} processes"
        )
    return global_batch_size // n


def local_device_batch(global_batch_size: int) -> int:
    """Per-device batch size on this host.

    Raises on indivisibility like :func:`process_local_batch` — silent
    flooring would make the hosts collectively assemble fewer samples than
    the sharded batch the train step expects, failing far from the cause."""
    per_process = process_local_batch(global_batch_size)
    d = jax.local_device_count()
    if per_process % d != 0:
        raise ValueError(
            f"per-process batch {per_process} not divisible by {d} local"
            " devices"
        )
    return per_process // d
