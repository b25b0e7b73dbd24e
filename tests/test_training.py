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
    make_chunked_train_step,
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

    def test_nonfinite_loss_skipped_under_momentum(self):
        """Masking only the GRADIENTS is not a skip under Adam: zero grads
        still decay the moments and the bias-corrected update is nonzero
        when momentum is warm (round-5 review regression).  The whole
        optimizer step — parameters AND optimizer state — must hold on a
        non-finite loss."""
        model = build_model()
        state, step = make_train_step(
            model, optax.adam(1e-2), lambda m, x, k: m.forward_kld(x)
        )
        x_good = distributions.TwoMoons().sample(jax.random.key(1), 64)
        for i in range(3):  # warm the Adam moments
            state, _ = step(state, x_good, jax.random.key(i))
        params_before = jax.tree.leaves(state.diff)
        opt_before = jax.tree.leaves(state.opt_state)
        state, metrics = step(state, jnp.full((8, 2), jnp.nan),
                              jax.random.key(9))
        assert not bool(metrics["finite"])
        for a, b in zip(params_before, jax.tree.leaves(state.diff)):
            assert_close(a, b)
        for a, b in zip(opt_before, jax.tree.leaves(state.opt_state)):
            assert_close(a, b)  # moments and count held too
        # and a finite step afterwards still trains
        state, metrics = step(state, x_good, jax.random.key(10))
        assert bool(metrics["finite"])


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


class TestChunkedTrainStep:
    """make_chunked_train_step: device-resident data, chunk_len steps per
    dispatch, on-device minibatch gather."""

    def test_sequential_chunked_matches_per_step_loop(self):
        model = build_model()
        x_all = distributions.TwoMoons().sample(jax.random.key(5), 1024)
        opt = optax.adam(5e-3)
        B, C = 128, 5

        loss_fn = lambda m, b, k: m.forward_kld(b)  # key-independent loss
        state_c, chunk = make_chunked_train_step(
            model, opt, loss_fn, x_all, batch_size=B, chunk_len=C,
            shuffle=False)
        state_c, metrics = chunk(state_c, jax.random.key(0))
        assert metrics["loss"].shape == (C,)

        state_p, step = make_train_step(model, opt, loss_fn)
        for i in range(C):
            s = (i * B) % (x_all.shape[0] - B + 1)
            state_p, m = step(state_p, x_all[s:s + B], jax.random.key(9))
            assert_close(m["loss"], metrics["loss"][i], atol=1e-6)
        for a, b in zip(
            jax.tree.leaves(state_c.diff), jax.tree.leaves(state_p.diff)
        ):
            assert_close(a, b, atol=1e-6)
        assert int(state_c.step) == C

    def test_shuffled_chunked_trains(self):
        model = build_model()
        x_all = distributions.TwoMoons().sample(jax.random.key(6), 2048)
        state, chunk = make_chunked_train_step(
            model, optax.adam(5e-3), lambda m, b, k: m.forward_kld(b),
            x_all, batch_size=256, chunk_len=10, shuffle=True, donate=False)
        first = None
        key = jax.random.key(1)
        for i in range(6):
            key, sub = jax.random.split(key)
            state, metrics = chunk(state, sub)
            if first is None:
                first = float(metrics["loss"][0])
        assert float(metrics["loss"][-1]) < first
        assert int(state.step) == 60

    def test_tuple_data_and_oversized_batch(self):
        model = build_model()
        x = distributions.TwoMoons().sample(jax.random.key(7), 256)
        y = jnp.zeros((256,), jnp.int32)
        state, chunk = make_chunked_train_step(
            model, optax.adam(1e-3), lambda m, b, k: m.forward_kld(b[0]),
            (x, y), batch_size=64, chunk_len=2)
        state, metrics = chunk(state, jax.random.key(0))
        assert metrics["loss"].shape == (2,)
        with pytest.raises(ValueError, match="exceeds dataset size"):
            make_chunked_train_step(
                model, optax.adam(1e-3), lambda m, b, k: m.forward_kld(b[0]),
                (x, y), batch_size=512, chunk_len=2)
