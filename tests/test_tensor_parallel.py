"""Tensor-parallel and FSDP parameter sharding (parallel/tensor_parallel.py).

The reference is single-device-only; these tiers are TPU-native scale-out.
Each test asserts the sharded step's loss AND post-step parameters exactly
match single-device execution on the 8-virtual-device CPU mesh, and that the
intended leaves really are laid out over the model axis (not silently
replicated by SPMD fallback).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import normflows_tpu as nf
from normflows_tpu import flows, distributions, parallel


def _ar_nsf_model(hidden=64, K=2):
    key = jax.random.key(0)
    base = distributions.UniformGaussian.create(
        2, [1], jnp.array([1.0, 2 * np.pi]))
    layers = [
        flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.fold_in(key, i), 2, 1, hidden, ind_circ=[1],
            num_bins=4, tail_bound=jnp.array([5.0, np.pi]),
            permute_mask=True, rng_seed=i,
        )
        for i in range(K)
    ]
    return nf.NormalizingFlow.create(
        base, layers, p=distributions.GaussianVonMises())


def _mlp_coupling_model(hidden=64, K=4):
    key = jax.random.key(7)
    layers = []
    for i in range(K):
        pm = nf.nets.MLP.create(
            jax.random.fold_in(key, i), [2, hidden, hidden, 2],
            init_zeros=True)
        mask = jnp.array([i % 2, (i + 1) % 2], dtype=jnp.float32)
        layers.append(flows.MaskedAffineFlow.create(mask, t=pm, s=None))
    return nf.NormalizingFlow.create(
        distributions.DiagGaussian.create(2), layers,
        p=distributions.TwoMoons())


def _single_device_step(model, opt, loss_fn, batch, key):
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    def step(diff, opt_state, batch, key):
        loss, grads = jax.value_and_grad(
            lambda d: loss_fn(nf.combine(d, rest), batch, key))(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    return jax.jit(step)(diff, opt_state, batch, key)


def _max_leaf_err(a, b):
    return max(
        float(jnp.max(jnp.abs(x - y)))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def _model_sharded_specs(tree, axis="model"):
    return [
        str(x.sharding.spec) for x in jax.tree.leaves(tree)
        if hasattr(x, "sharding") and axis in str(x.sharding.spec)
    ]


@pytest.fixture(scope="module")
def mesh():
    return parallel.make_mesh({"data": 2, "model": 4})


class TestTensorParallel:
    def test_made_net_matches_single_device(self, mesh):
        model = _ar_nsf_model()
        opt = optax.adam(1e-3)
        batch = jax.random.normal(jax.random.key(1), (16, 2))

        def loss_fn(m, b, k):
            return m.forward_kld(b) + 0.1 * m.reverse_kld(k, b.shape[0])

        rd, _, rl = _single_device_step(
            model, opt, loss_fn, batch, jax.random.key(2))
        step_fn, diff, rest, opt_state = parallel.make_tensor_parallel_step(
            model, opt, loss_fn, mesh)
        td, _, tl = step_fn(diff, opt_state,
                            parallel.shard_batch(batch, mesh),
                            jax.random.key(2))
        assert abs(float(rl) - float(tl)) < 1e-5
        assert _max_leaf_err(rd, td) < 1e-6

    def test_made_weights_are_model_sharded(self, mesh):
        model = _ar_nsf_model()
        sh = parallel.tp_shardings(model, mesh)
        placed = jax.device_put(model, sh)
        specs = _model_sharded_specs(placed)
        # each AR layer: 2 residual blocks x (col w, col b, row w) + final row
        assert len(specs) >= 8
        assert "PartitionSpec(None, 'model')" in specs  # column-parallel
        assert "PartitionSpec('model', None)" in specs  # row-parallel

    def test_mlp_net_matches_single_device(self, mesh):
        model = _mlp_coupling_model()
        opt = optax.adam(1e-3)
        batch = jax.random.normal(jax.random.key(1), (16, 2))

        def loss_fn(m, b, k):
            return m.forward_kld(b)

        rd, _, rl = _single_device_step(
            model, opt, loss_fn, batch, jax.random.key(3))
        step_fn, diff, rest, opt_state = parallel.make_tensor_parallel_step(
            model, opt, loss_fn, mesh)
        td, _, tl = step_fn(diff, opt_state,
                            parallel.shard_batch(batch, mesh),
                            jax.random.key(3))
        assert abs(float(rl) - float(tl)) < 1e-5
        assert _max_leaf_err(rd, td) < 1e-6
        assert len(_model_sharded_specs(td)) > 0

    def test_indivisible_hidden_falls_back_replicated(self, mesh):
        # hidden=50 is not divisible by the 4-wide model axis: every leaf
        # must fall back to replicated, and the step must still be exact
        model = _mlp_coupling_model(hidden=50, K=2)
        sh = parallel.tp_shardings(model, mesh)
        placed = jax.device_put(model, sh)
        assert _model_sharded_specs(placed) == []
        opt = optax.adam(1e-3)
        batch = jax.random.normal(jax.random.key(1), (16, 2))

        def loss_fn(m, b, k):
            return m.forward_kld(b)

        rd, _, rl = _single_device_step(
            model, opt, loss_fn, batch, jax.random.key(4))
        step_fn, diff, rest, opt_state = parallel.make_tensor_parallel_step(
            model, opt, loss_fn, mesh)
        td, _, tl = step_fn(diff, opt_state,
                            parallel.shard_batch(batch, mesh),
                            jax.random.key(4))
        assert abs(float(rl) - float(tl)) < 1e-5
        assert _max_leaf_err(rd, td) < 1e-6

    def test_donation_does_not_consume_callers_model(self, mesh):
        # device_put may alias buffers; the factory must copy so a donated
        # step call cannot delete the caller's model arrays
        model = _mlp_coupling_model(hidden=64, K=2)
        opt = optax.adam(1e-3)
        batch = parallel.shard_batch(
            jax.random.normal(jax.random.key(1), (16, 2)), mesh)

        def loss_fn(m, b, k):
            return m.forward_kld(b)

        step_fn, diff, rest, opt_state = parallel.make_tensor_parallel_step(
            model, opt, loss_fn, mesh)
        step_fn(diff, opt_state, batch, jax.random.key(0))
        # building a second step from the SAME model object must still work
        parallel.make_fsdp_step(
            model, opt, loss_fn, mesh, axis="model", min_size=64 * 64)
        # and the original leaves are still alive
        assert all(
            not x.is_deleted() for x in jax.tree.leaves(model)
            if hasattr(x, "is_deleted")
        )


class TestFSDP:
    def test_fsdp_matches_single_device(self, mesh):
        model = _mlp_coupling_model()
        opt = optax.adam(1e-3)
        batch = jax.random.normal(jax.random.key(1), (16, 2))

        def loss_fn(m, b, k):
            return m.forward_kld(b)

        rd, _, rl = _single_device_step(
            model, opt, loss_fn, batch, jax.random.key(5))
        step_fn, diff, rest, opt_state = parallel.make_fsdp_step(
            model, opt, loss_fn, mesh, axis="model", min_size=64 * 64)
        td, _, tl = step_fn(diff, opt_state,
                            parallel.shard_batch(batch, mesh),
                            jax.random.key(5))
        assert abs(float(rl) - float(tl)) < 1e-5
        assert _max_leaf_err(rd, td) < 1e-6
        # the 64x64 hidden weights and their Adam moments are sharded
        assert len(_model_sharded_specs(td)) > 0

    def test_fsdp_shards_optimizer_moments(self, mesh):
        model = _mlp_coupling_model()
        opt = optax.adam(1e-3)

        def loss_fn(m, b, k):
            return m.forward_kld(b)

        _, _, _, opt_state = parallel.make_fsdp_step(
            model, opt, loss_fn, mesh, axis="model", min_size=64 * 64)
        assert len(_model_sharded_specs(opt_state)) > 0


class TestConvTensorParallel:
    def test_glow_conv_nets_match_single_device(self, mesh):
        """Glow's ConvNet2d coupling nets under out/in-channel sharding."""
        from tests.test_glow_multiscale import build_glow

        model = build_glow(L=2, K=2, hidden=32, input_shape=(3, 8, 8))
        x = jax.random.uniform(jax.random.key(20), (16, 3, 8, 8),
                               minval=0.01, maxval=0.99)
        y = jax.random.randint(jax.random.key(21), (16,), 0, 10)
        model = model.init_actnorm(x, y)
        # SGD, not adamax: the sign-like adamax update (lr*m/u with u=|g|)
        # amplifies benign reduction-order noise in near-zero gradients to
        # O(lr) parameter differences; with SGD the post-step comparison
        # bounds the actual gradient error
        opt = optax.sgd(1e-3)

        def loss_fn(m, b, k):
            return m.forward_kld(*b)

        rd, _, rl = _single_device_step(
            model, opt, loss_fn, (x, y), jax.random.key(6))
        step_fn, diff, rest, opt_state = parallel.make_tensor_parallel_step(
            model, opt, loss_fn, mesh)
        batch = (parallel.shard_batch(x, mesh), parallel.shard_batch(y, mesh))
        td, _, tl = step_fn(diff, opt_state, batch, jax.random.key(6))
        assert abs(float(rl) - float(tl)) < 1e-4
        assert _max_leaf_err(rd, td) < 1e-5
        specs = _model_sharded_specs(td)
        assert any("'model', None, None, None" in s for s in specs)  # col
        assert any("None, 'model', None, None" in s for s in specs)  # row
