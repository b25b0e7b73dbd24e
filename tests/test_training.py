"""Training loop + checkpoint tests (new subsystems; SURVEY.md §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import normflows_tpu as nft
from normflows_tpu import flows, distributions
from normflows_tpu.nets import MLP
from normflows_tpu.training import (
    make_train_step,
    save_checkpoint,
    restore_checkpoint,
    CheckpointManager,
)
from tests.helpers import assert_close


def build_model(key=None):
    key = key if key is not None else jax.random.key(0)
    b = jnp.array([1.0, 0.0])
    layers = []
    for i in range(4):
        k1, k2, key = jax.random.split(key, 3)
        s = MLP.create(k1, [2, 32, 2], init_zeros=True)
        t = MLP.create(k2, [2, 32, 2], init_zeros=True)
        layers.append(flows.MaskedAffineFlow.create(b if i % 2 == 0 else 1 - b, t=t, s=s))
    return nft.NormalizingFlow.create(
        distributions.DiagGaussian.create(2), layers, p=distributions.TwoMoons()
    )


class TestTrainStep:
    def test_trains(self):
        model = build_model()
        state, step = make_train_step(
            model, optax.adam(5e-3), lambda m, x, k: m.forward_kld(x)
        )
        x_all = distributions.TwoMoons().sample(jax.random.key(1), 1024)
        losses = []
        for i in range(30):
            x = x_all[(i * 256) % 1024 : (i * 256) % 1024 + 256]
            state, metrics = step(state, x, jax.random.key(i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 30

    def test_nonfinite_loss_skipped(self):
        model = build_model()
        state, step = make_train_step(
            model, optax.sgd(1e-2), lambda m, x, k: m.forward_kld(x)
        )
        x_bad = jnp.full((8, 2), jnp.nan)
        before = jax.tree.leaves(state.diff)[1]
        state, metrics = step(state, x_bad, jax.random.key(0))
        after = jax.tree.leaves(state.diff)[1]
        assert not bool(metrics["finite"])
        assert_close(before, after)  # no update applied


class TestCheckpoint:
    def test_save_restore_model(self, tmp_path):
        model = build_model()
        p = str(tmp_path / "ckpt")
        save_checkpoint(p, model)
        model2 = restore_checkpoint(p, model)
        x = jax.random.normal(jax.random.key(2), (4, 2))
        assert_close(model.log_prob(x), model2.log_prob(x))

    def test_manager_roundtrip_with_opt_state(self, tmp_path):
        model = build_model()
        state, step = make_train_step(
            model, optax.adam(1e-3), lambda m, x, k: m.forward_kld(x)
        )
        x = distributions.TwoMoons().sample(jax.random.key(3), 64)
        for i in range(3):
            state, _ = step(state, x, jax.random.key(i))
        mgr = CheckpointManager(str(tmp_path / "run"), max_to_keep=2)
        mgr.save(3, {"diff": state.diff, "opt_state": state.opt_state})
        restored = mgr.restore({"diff": state.diff, "opt_state": state.opt_state})
        mgr.close()
        for a, b in zip(jax.tree.leaves(restored["diff"]), jax.tree.leaves(state.diff)):
            assert_close(a, b)
