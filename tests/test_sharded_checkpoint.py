"""Checkpoint round-trips under TP- and FSDP-sharded training state.

Round-2 verdict gap: ``training/checkpoint.py`` was tested replicated-only.
These tests save a tensor-parallel-sharded and an FSDP-sharded
``(diff, opt_state)`` on the 8-virtual-device mesh, restore into a fresh
template, resume one training step, and assert the resumed loss exactly
matches an uninterrupted run — plus a restore onto a *different* mesh
topology (orbax reshards from the on-disk global arrays).

Reference surface being extended: ``torch.save(state_dict)`` persistence at
/root/reference/normflows/core.py:199-213 (single-device only).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import normflows_tpu as nf
from normflows_tpu import parallel
from normflows_tpu.training.checkpoint import save_checkpoint, restore_checkpoint

from test_tensor_parallel import (  # reuse the validated model builders
    _ar_nsf_model,
    _mlp_coupling_model,
    _max_leaf_err,
)


def _loss_fn(model, batch, key):
    return model.reverse_kld(key, 64)


@pytest.fixture(scope="module")
def mesh():
    return parallel.make_mesh({"data": 2, "model": 4})


def _roundtrip(step_factory, model, mesh, tmp_path, axis_name):
    opt = optax.adam(1e-3)
    step_fn, diff, rest, opt_state = step_factory(model, opt, _loss_fn, mesh)

    # advance 2 steps so the Adam moments are non-trivial
    for i in range(2):
        diff, opt_state, loss = step_fn(diff, opt_state, None, jax.random.key(i))

    # the state must actually be sharded over the axis under test, or this
    # test silently degenerates to the replicated case
    sharded = [
        x for x in jax.tree.leaves(diff)
        if axis_name in str(x.sharding.spec)
    ]
    assert sharded, f"no leaf sharded over '{axis_name}' — model too small?"

    p = str(tmp_path / "ckpt")
    save_checkpoint(p, {"diff": diff, "opt_state": opt_state})

    # "fresh process": restore into an abstract template carrying the same
    # shardings (shapes/dtypes/shardings drive the restore)
    restored = restore_checkpoint(p, {"diff": diff, "opt_state": opt_state})
    r_diff, r_opt = restored["diff"], restored["opt_state"]

    assert _max_leaf_err(r_diff, diff) == 0.0
    for a, b in zip(jax.tree.leaves(r_diff), jax.tree.leaves(diff)):
        assert a.sharding == b.sharding

    # resume one step from the restored state vs the uninterrupted state:
    # losses and parameters must match exactly
    d1, o1, loss1 = step_fn(diff, opt_state, None, jax.random.key(99))
    d2, o2, loss2 = step_fn(r_diff, r_opt, None, jax.random.key(99))
    assert float(loss1) == float(loss2)
    assert _max_leaf_err(d1, d2) == 0.0


def test_tp_sharded_checkpoint_roundtrip(mesh, tmp_path):
    model = _ar_nsf_model(hidden=64, K=2)
    _roundtrip(
        parallel.make_tensor_parallel_step, model, mesh, tmp_path, "model"
    )


def test_fsdp_sharded_checkpoint_roundtrip(tmp_path):
    mesh = parallel.make_mesh({"data": 8})
    model = _mlp_coupling_model(hidden=64, K=2)

    def factory(model, opt, loss_fn, mesh):
        # min_size low enough that the 64x64 hidden matmuls shard
        return parallel.make_fsdp_step(
            model, opt, loss_fn, mesh, min_size=2**10
        )

    _roundtrip(factory, model, mesh, tmp_path, "data")


def test_restore_onto_different_mesh_topology(mesh, tmp_path):
    """Save TP-sharded on a (data=2, model=4) mesh, restore onto a
    (data=4, model=2) mesh: orbax reshards from the on-disk global arrays,
    and the restored values are bit-identical once gathered."""
    model = _ar_nsf_model(hidden=64, K=2)
    opt = optax.adam(1e-3)
    step_fn, diff, rest, opt_state = parallel.make_tensor_parallel_step(
        model, opt, _loss_fn, mesh
    )
    diff, opt_state, _ = step_fn(diff, opt_state, None, jax.random.key(0))
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, {"diff": diff, "opt_state": opt_state})

    mesh2 = parallel.make_mesh({"data": 4, "model": 2})
    _, diff2_t, _, opt2_t = parallel.make_tensor_parallel_step(
        model, opt, _loss_fn, mesh2
    )
    restored = restore_checkpoint(p, {"diff": diff2_t, "opt_state": opt2_t})

    # placed on the NEW mesh...
    for leaf in jax.tree.leaves(restored["diff"]):
        assert leaf.sharding.mesh.shape == {"data": 4, "model": 2}
    # ...with values identical to the saved state
    gathered_saved = jax.tree.map(lambda x: np.asarray(x), diff)
    gathered_restored = jax.tree.map(lambda x: np.asarray(x), restored["diff"])
    assert _max_leaf_err(gathered_saved, gathered_restored) == 0.0


def test_manager_restores_sharded_layout(mesh, tmp_path):
    """CheckpointManager.restore must land leaves on the template's
    shardings like restore_checkpoint does (round-5 review: the manager
    built its abstract template without shardings, so sharded train state
    restored onto default placement)."""
    from normflows_tpu.training import CheckpointManager

    model = _ar_nsf_model(hidden=64, K=2)
    opt = optax.adam(1e-3)
    step_fn, diff, rest, opt_state = parallel.make_tensor_parallel_step(
        model, opt, _loss_fn, mesh
    )
    diff, opt_state, _ = step_fn(diff, opt_state, None, jax.random.key(0))
    assert any("model" in str(x.sharding.spec) for x in jax.tree.leaves(diff))

    mgr = CheckpointManager(str(tmp_path / "mgr"))
    mgr.save(1, {"diff": diff, "opt_state": opt_state})
    restored = mgr.restore({"diff": diff, "opt_state": opt_state})
    mgr.close()
    for a, b in zip(jax.tree.leaves(restored["diff"]), jax.tree.leaves(diff)):
        assert a.sharding == b.sharding
    assert _max_leaf_err(restored["diff"], diff) == 0.0
