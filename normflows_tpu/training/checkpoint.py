"""Sharding-aware checkpointing via orbax.

Replaces the reference's ``torch.save(state_dict)`` (core.py:199-213) with
orbax pytree checkpoints: works for any Module (params + buffers are leaves),
restores onto the same sharding layout, and is safe for multi-host training
(orbax coordinates the processes).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree, step: Optional[int] = None, force: bool = True):
    """Save a pytree (model / (diff, rest, opt_state) tuple) to ``path``.

    With ``step`` the checkpoint is written to ``path/<step>`` so successive
    saves are versioned (pass the same step to :func:`restore_checkpoint`);
    without it, ``path`` itself is (over)written.  For rolling retention use
    :class:`CheckpointManager`."""
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=force)
    ckptr.wait_until_finished()


def _abstract_like(like):
    """ShapeDtypeStruct template carrying each leaf's sharding, so restores
    land on the same layout (a sharding-less template restores onto default
    single-device placement — an OOM risk for sharded state)."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape")
        else x,
        like,
    )


def restore_checkpoint(path: str, like, step: Optional[int] = None):
    """Restore a pytree saved with :func:`save_checkpoint`.

    ``like`` is a template with the same structure (an existing model) — its
    array shapes/dtypes/shardings drive the restore.  Pass the ``step`` the
    checkpoint was saved with, if any.
    """
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, str(step))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, _abstract_like(like))


class CheckpointManager:
    """Rolling training checkpoints with retention (orbax CheckpointManager)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, tree):
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        self._mgr.wait_until_finished()

    def restore(self, like, step: Optional[int] = None):
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        # same sharding-carrying template as restore_checkpoint: sharded
        # train state must come back on its layout, not default placement
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(_abstract_like(like)))

    def latest_step(self):
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
