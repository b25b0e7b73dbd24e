"""Pipeline parallelism over flow layers (parallel/pipeline.py).

GPipe-style microbatching over a ``stage`` mesh axis; each test checks the
pipelined result (and its gradients) against the plain sequential layer
loop on the 8-virtual-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import normflows_tpu as nf
from normflows_tpu import flows, parallel
from normflows_tpu.parallel.pipeline import make_pipeline_apply


def _layers(K=8, hidden=32):
    key = jax.random.key(0)
    return [
        flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.fold_in(key, i), 2, 1, hidden, ind_circ=[1],
            num_bins=4, tail_bound=jnp.array([5.0, np.pi]),
            permute_mask=True, rng_seed=0,
        )
        for i in range(K)
    ]


def _sequential(layers, z, reverse=False):
    ld = jnp.zeros(z.shape[0])
    seq = reversed(layers) if reverse else layers
    for l in seq:
        z, dl = (l.inverse if reverse else l.forward)(z)
        ld = ld + dl
    return z, ld


@pytest.fixture(scope="module")
def mesh():
    return parallel.make_mesh({"stage": 4}, devices=jax.devices()[:4])


class TestPipeline:
    def test_forward_matches_sequential(self, mesh):
        layers = _layers()
        z = jax.random.normal(jax.random.key(1), (32, 2))
        zs, lds = _sequential(layers, z)
        pipe = make_pipeline_apply(layers, mesh, num_microbatches=8)
        zp, ldp = jax.jit(pipe)(z)
        np.testing.assert_allclose(zs, zp, atol=1e-5)
        np.testing.assert_allclose(lds, ldp, atol=1e-4)

    def test_inverse_matches_sequential(self, mesh):
        layers = _layers()
        z = jax.random.normal(jax.random.key(2), (32, 2))
        zs, lds = _sequential(layers, z, reverse=True)
        pipe = make_pipeline_apply(layers, mesh, num_microbatches=8,
                                   reverse=True)
        zp, ldp = jax.jit(pipe)(z)
        np.testing.assert_allclose(zs, zp, atol=1e-5)
        np.testing.assert_allclose(lds, ldp, atol=1e-4)

    def test_default_microbatch_count(self, mesh):
        layers = _layers()
        z = jax.random.normal(jax.random.key(3), (32, 2))  # 32 % (2*4) == 0
        zp, ldp = jax.jit(make_pipeline_apply(layers, mesh))(z)
        zs, lds = _sequential(layers, z)
        np.testing.assert_allclose(zs, zp, atol=1e-5)

    def test_gradients_match_sequential(self, mesh):
        layers = _layers()
        z = jax.random.normal(jax.random.key(4), (32, 2))
        ldiff, lrest = nf.partition(tuple(layers))

        def loss_pipe(d):
            pipe = make_pipeline_apply(
                list(nf.combine(d, lrest)), mesh, num_microbatches=8)
            zo, ld = pipe(z)
            return jnp.sum(zo ** 2) + jnp.sum(ld)

        def loss_seq(d):
            zo, ld = _sequential(list(nf.combine(d, lrest)), z)
            return jnp.sum(zo ** 2) + jnp.sum(ld)

        gp = jax.grad(loss_pipe)(ldiff)
        gs = jax.grad(loss_seq)(ldiff)
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
            np.testing.assert_allclose(a, b, atol=1e-4)

    def test_per_sample_context_matches_sequential(self, mesh):
        """A per-sample context must ride the schedule WITH its microbatch
        (round-5 review regression: the full-batch context was closed over,
        pairing (mb, ...) activations with (batch, ...) context rows)."""
        key = jax.random.key(5)
        layers = [
            flows.AutoregressiveRationalQuadraticSpline.create(
                jax.random.fold_in(key, i), 2, 1, 24,
                num_context_channels=3, num_bins=4, permute_mask=True,
                init_identity=False,  # identity init would make the
                # context (and the whole comparison) vacuous
            )
            for i in range(8)
        ]
        z = jax.random.normal(jax.random.key(6), (32, 2))
        ctx = jax.random.normal(jax.random.key(7), (32, 3))
        ld = jnp.zeros(32)
        zs = z
        for l in layers:
            zs, dl = l.forward(zs, ctx)
            ld = ld + dl
        pipe = make_pipeline_apply(layers, mesh, num_microbatches=8)
        zp, ldp = jax.jit(pipe)(z, ctx)
        np.testing.assert_allclose(zs, zp, atol=1e-5)
        np.testing.assert_allclose(ld, ldp, atol=1e-4)
        # context must matter (guard against a silently-dropped context)
        zp0, _ = jax.jit(pipe)(z, 0 * ctx)
        assert float(jnp.max(jnp.abs(zp0 - zp))) > 1e-4

    def test_unbatched_context_length_equal_to_batch(self, mesh):
        """A 1-D (unbatched) context whose length coincidentally equals the
        batch size must pass through whole, not be microbatched into
        per-sample row blocks (round-5 review: the per_sample check
        accepted ndim >= 1)."""
        key = jax.random.key(8)
        layers = [
            flows.AutoregressiveRationalQuadraticSpline.create(
                jax.random.fold_in(key, i), 2, 1, 24,
                num_context_channels=32, num_bins=4, permute_mask=True,
                init_identity=False,
            )
            for i in range(8)
        ]
        z = jax.random.normal(jax.random.key(9), (32, 2))
        ctx = jax.random.normal(jax.random.key(10), (32,))  # len == batch
        ld = jnp.zeros(32)
        zs = z
        for l in layers:
            zs, dl = l.forward(zs, ctx)
            ld = ld + dl
        pipe = make_pipeline_apply(layers, mesh, num_microbatches=8)
        zp, ldp = jax.jit(pipe)(z, ctx)
        np.testing.assert_allclose(zs, zp, atol=1e-5)
        np.testing.assert_allclose(ld, ldp, atol=1e-4)

    def test_indivisible_depth_raises(self, mesh):
        with pytest.raises(ValueError, match="divisible"):
            make_pipeline_apply(_layers(K=6), mesh)

    def test_indivisible_batch_raises(self, mesh):
        pipe = make_pipeline_apply(_layers(), mesh, num_microbatches=8)
        z = jax.random.normal(jax.random.key(5), (30, 2))
        with pytest.raises(ValueError, match="microbatches"):
            pipe(z)

    def test_heterogeneous_layers_raise(self, mesh):
        layers = _layers(K=4)
        layers[2] = flows.Planar.create(2, key=jax.random.key(9))
        with pytest.raises(ValueError, match="homogeneous"):
            make_pipeline_apply(layers, mesh)


class TestPipelineTrainStep:
    """make_pipeline_train_step: a full pipelined TRAINING step (loss +
    grads through the ppermute schedule + optimizer update) must match the
    plain single-device step exactly."""

    def _model(self, K=8, hidden=32):
        from normflows_tpu import distributions
        return nf.NormalizingFlow.create(
            distributions.DiagGaussian.create(2), _layers(K, hidden),
            p=distributions.TwoMoons())

    def _seq_step(self, model, opt, loss_fn, batch, key, n_steps=2):
        import optax
        diff, rest = nf.partition(model)
        opt_state = opt.init(diff)

        @jax.jit
        def step(diff, opt_state, batch, key):
            loss, grads = jax.value_and_grad(
                lambda d: loss_fn(nf.combine(d, rest), batch, key))(diff)
            updates, opt_state = opt.update(grads, opt_state, diff)
            return optax.apply_updates(diff, updates), opt_state, loss

        losses = []
        for i in range(n_steps):
            diff, opt_state, loss = step(
                diff, opt_state, batch, jax.random.fold_in(key, i))
            losses.append(float(loss))
        return nf.combine(diff, rest), losses

    def _flat_layer_params(self, model_or_diff_stack):
        return jax.tree.leaves(model_or_diff_stack)

    def test_forward_kld_train_matches_sequential(self, mesh):
        import optax
        model = self._model()
        x = distributions_sample_two_moons(256)
        opt = optax.adam(1e-3)

        step_fn, diff, rest, opt_state = parallel.make_pipeline_train_step(
            model, opt, mesh, num_microbatches=8)
        losses_pp = []
        for i in range(2):
            diff, opt_state, loss = step_fn(
                diff, opt_state, x, jax.random.fold_in(jax.random.key(0), i))
            losses_pp.append(float(loss))

        _, losses_seq = self._seq_step(
            model, opt, lambda m, b, k: m.forward_kld(b), x,
            jax.random.key(0))
        np.testing.assert_allclose(losses_pp, losses_seq, atol=1e-5)

        # post-step layer params match too (stage-stacked vs per-layer:
        # compare sorted flat values)
        seq_model, _ = self._seq_step(
            model, opt, lambda m, b, k: m.forward_kld(b), x,
            jax.random.key(0))
        stacked_ref = parallel.pipeline._stack_layers(
            list(seq_model.flows)[::-1], 4)
        sref, _ = nf.partition(stacked_ref)
        for a, b in zip(jax.tree.leaves(diff["stack"]), jax.tree.leaves(sref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_reverse_kld_train_matches_sequential(self, mesh):
        import optax
        model = self._model()
        opt = optax.adam(1e-3)
        N = 64

        def seq_loss(m, batch, key):
            z, log_q = m.q0.sample_and_log_prob(key, N)
            ld = jnp.zeros(z.shape[0])
            for l in m.flows:
                z, dl = l.forward(z)
                ld = ld + dl
            return jnp.mean(log_q - ld) - jnp.mean(m.p.log_prob(z))

        step_fn, diff, rest, opt_state = parallel.make_pipeline_train_step(
            model, opt, mesh, num_microbatches=8, objective="reverse_kld",
            num_samples=N)
        losses_pp = []
        for i in range(2):
            diff, opt_state, loss = step_fn(
                diff, opt_state, None, jax.random.fold_in(jax.random.key(3), i))
            losses_pp.append(float(loss))

        _, losses_seq = self._seq_step(
            model, opt, seq_loss, None, jax.random.key(3))
        np.testing.assert_allclose(losses_pp, losses_seq, atol=1e-5)

    def test_stage_sharded_state(self, mesh):
        """Layer params and their Adam moments live stage-sharded — each
        device holds only its own stages' layers."""
        import optax
        model = self._model()
        step_fn, diff, rest, opt_state = parallel.make_pipeline_train_step(
            model, optax.adam(1e-3), mesh, num_microbatches=8)
        specs = {
            str(x.sharding.spec) for x in jax.tree.leaves(diff["stack"])
        }
        assert all("stage" in s for s in specs), specs
        moment_specs = {
            str(x.sharding.spec)
            for x in jax.tree.leaves(opt_state)
            if hasattr(x, "sharding") and x.ndim > 0
        }
        assert any("stage" in s for s in moment_specs), moment_specs


def distributions_sample_two_moons(n):
    from normflows_tpu import distributions
    return distributions.TwoMoons().sample(jax.random.key(17), n)
