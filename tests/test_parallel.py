"""Multi-device sharding tests on the 8-virtual-device CPU mesh (conftest
forces XLA_FLAGS=--xla_force_host_platform_device_count=8).

The reference has no distributed tier (SURVEY.md §2.7); these tests pin down
the new TPU-native behavior: sharded batches produce bitwise-identical losses
to single-device execution, and the chain axis shards cleanly."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import normflows_tpu as nft
from normflows_tpu import flows, distributions, parallel
from normflows_tpu.nets import MLP
from tests.helpers import assert_close


def build_model(K=4, key=None):
    key = key if key is not None else jax.random.key(0)
    b = jnp.array([1.0, 0.0])
    layers = []
    for i in range(K):
        k1, k2, key = jax.random.split(key, 3)
        s = MLP.create(k1, [2, 32, 2], init_zeros=True)
        t = MLP.create(k2, [2, 32, 2], init_zeros=True)
        layers.append(flows.MaskedAffineFlow.create(b if i % 2 == 0 else 1 - b, t=t, s=s))
    return nft.NormalizingFlow.create(
        distributions.DiagGaussian.create(2), layers, p=distributions.TwoMoons()
    )


class TestMesh:
    def test_make_mesh_default(self):
        mesh = parallel.make_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("data",)

    def test_make_mesh_2d(self):
        mesh = parallel.make_mesh({"data": 4, "chain": -1})
        assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
            "data": 4, "chain": 2,
        }

    def test_shard_batch(self):
        mesh = parallel.make_mesh()
        x = jnp.zeros((16, 2))
        xs = parallel.shard_batch(x, mesh)
        assert len(xs.sharding.device_set) == 8


class TestDataParallel:
    def test_sharded_loss_matches_single_device(self):
        model = build_model()
        mesh = parallel.make_mesh()
        x = distributions.TwoMoons().sample(jax.random.key(1), 64)

        loss_single = float(model.forward_kld(x))
        xs = parallel.shard_batch(x, mesh)
        loss_sharded = float(jax.jit(lambda m, x: m.forward_kld(x))(model, xs))
        assert_close(loss_sharded, loss_single, atol=1e-5, rtol=1e-5)

    def test_train_step_runs_and_improves(self):
        model = build_model()
        mesh = parallel.make_mesh()
        opt = optax.adam(5e-3)

        step_fn, diff, rest, opt_state = parallel.make_data_parallel_step(
            model, opt, lambda m, x, key: m.forward_kld(x), mesh
        )
        x_all = distributions.TwoMoons().sample(jax.random.key(2), 1024)
        losses = []
        for i in range(30):
            x = parallel.shard_batch(
                x_all[(i * 256) % 1024 : (i * 256) % 1024 + 256], mesh
            )
            diff, opt_state, loss = step_fn(diff, opt_state, x, jax.random.key(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        # params stay replicated
        leaf = jax.tree.leaves(diff)[0]
        assert len(leaf.sharding.device_set) == 8

    def test_sharded_equals_unsharded_gradients(self):
        model = build_model()
        mesh = parallel.make_mesh()
        x = distributions.TwoMoons().sample(jax.random.key(3), 64)
        diff, rest = nft.partition(model)

        g1 = jax.grad(lambda d: nft.combine(d, rest).forward_kld(x))(diff)
        xs = parallel.shard_batch(x, mesh)
        g2 = jax.jit(
            lambda d, x: jax.grad(
                lambda dd: nft.combine(dd, rest).forward_kld(x)
            )(d)
        )(diff, xs)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            assert_close(a, b, atol=1e-5, rtol=1e-4)


class TestChainParallel:
    def test_hais_sharded(self):
        from normflows_tpu.sampling import HAIS

        prior = distributions.DiagGaussian.create(2)
        target = distributions.DiagGaussian.create(2).replace(
            loc=jnp.full((1, 2), 1.0)
        )
        betas = np.linspace(1.0, 0.0, 6)
        hais = HAIS.create(betas, prior, target, num_leapfrog=3,
                           step_size=jnp.full(2, 0.3), log_mass=jnp.zeros(2))
        mesh = parallel.make_mesh()
        run = parallel.parallel_chain_sample(hais, mesh, 512)
        samples, log_w = run(jax.random.key(4))
        assert samples.shape == (512, 2)
        assert len(samples.sharding.device_set) == 8
        w = jax.nn.softmax(log_w)
        mean_est = jnp.sum(w[:, None] * samples, axis=0)
        assert_close(mean_est, jnp.ones(2), atol=0.3, rtol=0.3)

    def test_reverse_kld_sharded_sampling(self):
        model = build_model()
        mesh = parallel.make_mesh()

        @jax.jit
        def loss(m, key):
            return m.reverse_kld(key, 256)

        val = loss(parallel.replicate(model, mesh), jax.random.key(5))
        assert jnp.isfinite(val)


class TestReverseKLDStep:
    def test_sharded_step_matches_single_device(self):
        """make_reverse_kld_step: with partitionable threefry the sampled batch
        is bit-identical across mesh sizes, so the sharded loss must equal the
        single-device loss and the updated params must stay replicated."""
        model = build_model()
        mesh = parallel.make_mesh()
        opt = optax.adam(1e-3)
        key = jax.random.key(7)

        # single-device reference value
        diff0, rest = nft.partition(model)
        loss_single = float(
            nft.combine(diff0, rest).reverse_kld(key, 256)
        )

        step_fn, diff, rest_r, opt_state = parallel.make_reverse_kld_step(
            jax.tree.map(jnp.copy, model), opt, mesh, 256
        )
        diff, opt_state, loss = step_fn(diff, opt_state, key)
        assert_close(float(loss), loss_single, atol=1e-5, rtol=1e-5)
        leaf = jax.tree.leaves(diff)[0]
        assert len(leaf.sharding.device_set) == 8

    def test_scaling_harness_smoke(self):
        """bench_scaling.measure_point runs on 1 and 8 virtual devices."""
        import bench_scaling

        model = bench_scaling.build_model(num_layers=1, hidden=32)
        r1 = bench_scaling.measure_point(model, 1, 64, iters=2, warmup=1)
        r8 = bench_scaling.measure_point(model, 8, 64, iters=2, warmup=1)
        assert r1 > 0 and r8 > 0


class TestShardedGlow:
    """NCHW image model under a sharded batch axis: Squeeze's 6-D reshapes,
    channel Split/Merge, conv param maps, and class-conditional bases must
    commute with batch sharding (the conv half of the sharding story)."""

    def _model_and_data(self, batch=16):
        from tests.test_glow_multiscale import build_glow

        model = build_glow(L=2, K=2, hidden=16, input_shape=(3, 8, 8))
        x = jax.random.uniform(jax.random.key(20), (batch, 3, 8, 8),
                               minval=0.01, maxval=0.99)
        y = jax.random.randint(jax.random.key(21), (batch,), 0, 10)
        return model.init_actnorm(x, y), x, y

    def test_sharded_loss_and_grads_match_single_device(self):
        model, x, y = self._model_and_data()
        mesh = parallel.make_mesh()
        diff, rest = nft.partition(model)

        loss1 = float(nft.combine(diff, rest).forward_kld(x, y))
        g1 = jax.grad(lambda d: nft.combine(d, rest).forward_kld(x, y))(diff)

        xs = parallel.shard_batch(x, mesh)
        ys = parallel.shard_batch(y, mesh)
        loss2 = float(jax.jit(lambda m, a, b: m.forward_kld(a, b))(model, xs, ys))
        assert_close(loss2, loss1, atol=1e-5, rtol=1e-5)

        g2 = jax.jit(
            lambda d, a, b: jax.grad(
                lambda dd: nft.combine(dd, rest).forward_kld(a, b)
            )(d)
        )(diff, xs, ys)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            assert_close(a, b, atol=1e-5, rtol=1e-4)

    def test_sharded_train_step(self):
        """Full data-parallel Glow train step keeps params replicated and
        the loss finite (inverse convs + Merge under sharding)."""
        model, x, y = self._model_and_data()
        mesh = parallel.make_mesh()
        opt = optax.adamax(1e-3)

        step_fn, diff, rest, opt_state = parallel.make_data_parallel_step(
            model, opt, lambda m, batch, key: m.forward_kld(*batch), mesh
        )
        batch = (parallel.shard_batch(x, mesh), parallel.shard_batch(y, mesh))
        diff, opt_state, loss = step_fn(diff, opt_state, batch, jax.random.key(0))
        assert jnp.isfinite(loss)
        leaf = jax.tree.leaves(diff)[0]
        assert len(leaf.sharding.device_set) == 8


class TestReplicatePlacementSafety:
    def test_donated_step_does_not_consume_callers_model(self):
        """replicate() must copy: a donated step call must not delete the
        caller's model arrays via device_put buffer aliasing."""
        import normflows_tpu as nft
        from normflows_tpu import flows, distributions

        layers = [
            flows.MaskedAffineFlow.create(
                jnp.array([i % 2, (i + 1) % 2], dtype=jnp.float32),
                t=nft.nets.MLP.create(jax.random.key(i), [2, 16, 2],
                                      init_zeros=True),
                s=None,
            )
            for i in range(2)
        ]
        model = nft.NormalizingFlow.create(
            distributions.DiagGaussian.create(2), layers)
        mesh = parallel.make_mesh()
        step_fn, diff, rest, opt_state = parallel.make_data_parallel_step(
            model, optax.adam(1e-3), lambda m, b, key: m.forward_kld(b), mesh)
        batch = parallel.shard_batch(
            jax.random.normal(jax.random.key(1), (16, 2)), mesh)
        step_fn(diff, opt_state, batch, jax.random.key(0))
        assert all(
            not x.is_deleted() for x in jax.tree.leaves(model)
            if hasattr(x, "is_deleted")
        )
        # and a second factory over the SAME model still works
        parallel.make_data_parallel_step(
            model, optax.adam(1e-3), lambda m, b, key: m.forward_kld(b), mesh)


class TestConvergenceEquivalence:
    """Many-step multi-device training must TRACK single-device training.

    Single-step equivalence (tests above) cannot see the bug class that only
    accumulates over a trajectory: per-step RNG reuse across devices,
    optimizer-state sharding drift, donation/aliasing corruption.  Here the
    tiny flagship trains a few hundred iterations under data-parallel
    (reverse KLD, per-step PRNG) and FSDP (forward KLD, sharded Adam
    moments), and the loss trajectory + final held-out metric must match the
    single-device run (round-4 review demand; SURVEY §2.7 data-parallel row).
    """

    ITERS = 200

    def _flagship_tiny(self):
        base = distributions.UniformGaussian.create(
            2, [1], jnp.array([1.0, 2 * np.pi]))
        layers = [
            flows.CircularAutoregressiveRationalQuadraticSpline.create(
                jax.random.key(i), 2, 1, 32, ind_circ=[1], num_bins=4,
                tail_bound=jnp.array([5.0, np.pi]), permute_mask=True,
                rng_seed=i,
            )
            for i in range(2)
        ]
        return nft.NormalizingFlow.create(
            base, layers, p=distributions.GaussianVonMises())

    def test_data_parallel_trajectory_matches_single_device(self):
        model = self._flagship_tiny()
        opt = optax.adam(5e-3)
        mesh = parallel.make_mesh()
        n = 256

        # single-device trajectory
        diff_s, rest = nft.partition(model)
        opt_s = opt.init(diff_s)

        @jax.jit
        def step_single(diff, opt_state, key):
            loss, grads = jax.value_and_grad(
                lambda d: nft.combine(d, rest).reverse_kld(key, n))(diff)
            updates, opt_state = opt.update(grads, opt_state, diff)
            return optax.apply_updates(diff, updates), opt_state, loss

        # sharded trajectory (same per-step keys)
        step_fn, diff_p, rest_p, opt_p = parallel.make_reverse_kld_step(
            jax.tree.map(jnp.copy, model), opt, mesh, n, donate=False)

        losses_s, losses_p = [], []
        for i in range(self.ITERS):
            key = jax.random.key(1000 + i)
            diff_s, opt_s, ls = step_single(diff_s, opt_s, key)
            diff_p, opt_p, lp = step_fn(diff_p, opt_p, key)
            losses_s.append(float(ls))
            losses_p.append(float(lp))

        # early trajectory: numerically tight (same samples, same updates)
        np.testing.assert_allclose(losses_p[:30], losses_s[:30],
                                   atol=1e-3, rtol=1e-3)
        # both must actually have trained
        assert np.mean(losses_s[-10:]) < np.mean(losses_s[:10])
        assert np.mean(losses_p[-10:]) < np.mean(losses_p[:10])
        # final held-out KL(q||p) proxy: E_p[-log q] on a fixed target sample
        x_held = model.p.sample(jax.random.key(9), 4096)
        nll_s = float(nft.combine(diff_s, rest).forward_kld(x_held))
        nll_p = float(
            jax.jit(lambda d: nft.combine(d, rest).forward_kld(x_held))(diff_p)
        )
        assert abs(nll_s - nll_p) < 0.05, (nll_s, nll_p)

    def test_fsdp_trajectory_matches_single_device(self):
        model = self._flagship_tiny()
        opt = optax.adam(5e-3)
        mesh = parallel.make_mesh({"data": 2, "model": 4})
        x_all = model.p.sample(jax.random.key(3), 512)
        batch = 64

        diff_s, rest = nft.partition(model)
        opt_s = opt.init(diff_s)

        @jax.jit
        def step_single(diff, opt_state, x):
            loss, grads = jax.value_and_grad(
                lambda d: nft.combine(d, rest).forward_kld(x))(diff)
            updates, opt_state = opt.update(grads, opt_state, diff)
            return optax.apply_updates(diff, updates), opt_state, loss

        step_fn, diff_p, rest_p, opt_p = parallel.make_fsdp_step(
            jax.tree.map(jnp.copy, model), opt,
            lambda m, b, key: m.forward_kld(b), mesh,
            axis="model", min_size=512, donate=False)
        # the sharding must actually bite, or this tests nothing
        n_sharded = sum(
            1 for x in jax.tree.leaves(diff_p)
            if "model" in str(x.sharding.spec))
        assert n_sharded > 0

        losses_s, losses_p = [], []
        for i in range(self.ITERS):
            x = x_all[(i * batch) % 512:(i * batch) % 512 + batch]
            diff_s, opt_s, ls = step_single(diff_s, opt_s, x)
            diff_p, opt_p, lp = step_fn(diff_p, opt_p,
                                        parallel.shard_batch(x, mesh),
                                        jax.random.key(i))
            losses_s.append(float(ls))
            losses_p.append(float(lp))

        np.testing.assert_allclose(losses_p[:30], losses_s[:30],
                                   atol=1e-3, rtol=1e-3)
        assert np.mean(losses_s[-10:]) < np.mean(losses_s[:10])
        assert np.mean(losses_p[-10:]) < np.mean(losses_p[:10])
        x_held = model.p.sample(jax.random.key(9), 4096)
        nll_s = float(nft.combine(diff_s, rest).forward_kld(x_held))
        nll_p = float(
            jax.jit(lambda d: nft.combine(d, rest).forward_kld(x_held))(diff_p)
        )
        assert abs(nll_s - nll_p) < 0.05, (nll_s, nll_p)


def test_pallas_spline_path_partitions_without_allgather():
    """The AR fast path's kernels must partition over the batch axis under
    SPMD (jax>=0.9 pallas_call auto-shard_map) instead of forcing a
    replicating all-gather — the latent pod-scaling cliff this guards.
    Checked on the virtual mesh in interpret mode: sharded execution matches
    the unsharded result and the compiled SPMD program contains no
    all-gather.  Alignment matters: the batch must fold into kernel grid
    blocks that divide evenly across shards (per-device batch a multiple of
    the kernel block, as in every shipped config — docs/scaling.md); the
    misaligned case degrades to gathers in the emulation."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from normflows_tpu import flows
    from normflows_tpu.ops import backend

    layer = flows.CircularAutoregressiveRationalQuadraticSpline.create(
        jax.random.key(3), 2, 1, 32, ind_circ=[1], num_bins=6,
        tail_bound=jnp.array([5.0, np.pi]), permute_mask=True, rng_seed=3)
    x = jax.random.normal(jax.random.key(1), (8192, 2))

    backend.set_kernel_backend("pallas")
    backend.set_pallas_interpret(True)
    try:
        assert layer.mprqat._transposed_ok(x, None)
        mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        f = jax.jit(lambda z: layer.forward(z))
        z_sh, ld_sh = f(xs)
        compiled = f.lower(xs).compile().as_text()
        assert "all-gather" not in compiled
        z_ref, ld_ref = layer.forward(x)
    finally:
        backend.set_kernel_backend("auto")
        backend.set_pallas_interpret(False)
    np.testing.assert_allclose(np.asarray(z_sh), np.asarray(z_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_sh), np.asarray(ld_ref),
                               atol=1e-4, rtol=1e-4)


def test_local_device_batch_rejects_indivisible():
    """local_device_batch must raise on indivisibility like its sibling
    process_local_batch — silent flooring would make hosts collectively
    assemble fewer samples than the sharded batch expects (round-5 review)."""
    import pytest
    from normflows_tpu import parallel

    d = jax.local_device_count()  # 8 virtual devices under conftest
    assert parallel.local_device_batch(4 * d) == 4
    with pytest.raises(ValueError, match="not divisible"):
        parallel.local_device_batch(d + 1)


def test_save_checkpoint_step_versioning(tmp_path):
    """save_checkpoint(step=N) writes versioned checkpoints: two saves with
    different steps must both be restorable (round-5 review: step was
    silently ignored and the second save destroyed the first)."""
    from normflows_tpu.training import save_checkpoint, restore_checkpoint

    tree = {"w": jnp.arange(4.0)}
    base = str(tmp_path / "ck")
    save_checkpoint(base, tree, step=100)
    save_checkpoint(base, {"w": jnp.arange(4.0) * 2}, step=200)
    r100 = restore_checkpoint(base, tree, step=100)
    r200 = restore_checkpoint(base, tree, step=200)
    np.testing.assert_allclose(np.asarray(r100["w"]), np.arange(4.0))
    np.testing.assert_allclose(np.asarray(r200["w"]), np.arange(4.0) * 2)
