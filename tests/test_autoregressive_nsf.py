"""MADE / MAF / neural-spline flow tests (cf. reference nets/made_test.py,
flows/affine/autoregressive_test.py, flows/neural_spline/wrapper_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import normflows_tpu as nft
from normflows_tpu import flows, distributions
from normflows_tpu.nets import MADE, ResidualNet, ConvResidualNet
from tests.helpers import assert_close, check_forward_inverse

KEY = jax.random.key(7)


def rand(shape, key=KEY):
    return jax.random.normal(key, shape)


class TestMADE:
    def test_shapes(self):
        made = MADE.create(KEY, features=5, hidden_features=32, output_multiplier=3)
        out = made(rand((7, 5)))
        assert out.shape == (7, 15)

    def test_autoregressive_property(self):
        """Output for dim i must not depend on inputs j >= i (degree order)."""
        D = 6
        made = MADE.create(KEY, features=D, hidden_features=64, output_multiplier=2)
        x = rand((1, D))

        jac = jax.jacobian(lambda x: made(x[None])[0])(x[0])  # (D*2, D)
        jac = jac.reshape(D, 2, D)
        for i in range(D):
            for j in range(D):
                if j >= i:  # degrees are 1..D in order; output i has degree i+1
                    assert_close(jac[i, :, j], jnp.zeros(2), atol=1e-6,
                                 msg=f"output {i} depends on input {j}")

    def test_context(self):
        made = MADE.create(KEY, features=4, hidden_features=16,
                           context_features=3, output_multiplier=2)
        out = made(rand((5, 4)), rand((5, 3), jax.random.key(1)))
        assert out.shape == (5, 8)

    def test_feedforward_blocks(self):
        made = MADE.create(KEY, features=4, hidden_features=16,
                           use_residual_blocks=False, output_multiplier=1)
        assert made(rand((5, 4))).shape == (5, 4)


class TestMAF:
    @pytest.mark.parametrize("use_residual_blocks", [True, False])
    def test_roundtrip(self, use_residual_blocks):
        flow = flows.MaskedAffineAutoregressive.create(
            KEY, features=4, hidden_features=32,
            use_residual_blocks=use_residual_blocks,
        )
        check_forward_inverse(flow, rand((5, 4)), atol=1e-3, rtol=1e-3)

    def test_context(self):
        flow = flows.MaskedAffineAutoregressive.create(
            KEY, features=4, hidden_features=32, context_features=2
        )
        ctx = rand((5, 2), jax.random.key(3))
        z = rand((5, 4))
        out, ld_f = flow.forward(z, ctx)
        rec, ld_i = flow.inverse(out, ctx)
        assert_close(rec, z, atol=1e-3, rtol=1e-3)
        assert_close(ld_f + ld_i, jnp.zeros(5), atol=1e-3)


class TestNSFWrappers:
    @pytest.mark.parametrize("latent", [2, 5])
    @pytest.mark.parametrize("context", [None, 3])
    def test_coupled_rqs(self, latent, context):
        flow = flows.CoupledRationalQuadraticSpline.create(
            KEY, latent, 2, 32, num_context_channels=context
        )
        z = 2.0 * rand((6, latent))
        ctx = rand((6, context), jax.random.key(5)) if context else None
        check_forward_inverse(flow, z, context=ctx, atol=1e-3, rtol=1e-3)

    def test_coupled_rqs_identity_init(self):
        flow = flows.CoupledRationalQuadraticSpline.create(KEY, 4, 2, 32)
        z = rand((5, 4))
        out, ld = flow.forward(z)
        assert_close(out, z, atol=1e-5)
        assert_close(ld, jnp.zeros(5), atol=1e-5)

    @pytest.mark.parametrize("tail_bound", [3.0, "tensor"])
    def test_circular_coupled(self, tail_bound):
        tb = jnp.array([5.0, np.pi]) if tail_bound == "tensor" else tail_bound
        flow = flows.CircularCoupledRationalQuadraticSpline.create(
            KEY, 2, 2, 32, ind_circ=[1], tail_bound=tb
        )
        z = jnp.stack(
            [2 * rand((8,)),
             jax.random.uniform(jax.random.key(2), (8,), minval=-np.pi, maxval=np.pi)],
            axis=1,
        )
        check_forward_inverse(flow, z, atol=1e-3, rtol=1e-3)

    @pytest.mark.parametrize("permute_mask", [False, True])
    def test_ar_rqs(self, permute_mask):
        flow = flows.AutoregressiveRationalQuadraticSpline.create(
            KEY, 3, 2, 32, permute_mask=permute_mask
        )
        check_forward_inverse(flow, 2 * rand((5, 3)), atol=1e-3, rtol=1e-3)

    def test_circular_ar_rqs(self):
        flow = flows.CircularAutoregressiveRationalQuadraticSpline.create(
            KEY, 2, 1, 64, ind_circ=[1], num_bins=10,
            tail_bound=jnp.array([5.0, np.pi]), permute_mask=True,
        )
        z = jnp.stack(
            [2 * rand((8,)),
             jax.random.uniform(jax.random.key(4), (8,), minval=-np.pi, maxval=np.pi)],
            axis=1,
        )
        check_forward_inverse(flow, z, atol=1e-3, rtol=1e-3)

    def test_conv_coupling_4d(self):
        def net_fn(in_ch, out_ch):
            return ConvResidualNet.create(KEY, in_ch, out_ch, hidden_channels=16)

        flow = flows.PiecewiseRationalQuadraticCoupling.create(
            mask=np.array([1, 0, 1, 0]), transform_net_create_fn=net_fn,
            num_bins=4, tails="linear", tail_bound=3.0,
        )
        z = rand((2, 4, 4, 4))
        check_forward_inverse(flow, z, atol=1e-3, rtol=1e-3)


class TestNSFCylinderModel:
    """The flagship reverse-KL benchmark config (paper_example_nsf.ipynb)."""

    def _build(self, K=2):
        base = distributions.UniformGaussian.create(2, [1], jnp.array([1.0, 2 * np.pi]))
        layers = []
        for i in range(K):
            layers.append(
                flows.CircularAutoregressiveRationalQuadraticSpline.create(
                    jax.random.key(i), 2, 1, 64, ind_circ=[1], num_bins=8,
                    tail_bound=jnp.array([5.0, np.pi]), permute_mask=True,
                    rng_seed=i,
                )
            )
        target = distributions.GaussianVonMises()
        return nft.NormalizingFlow.create(base, layers, p=target)

    def test_sample_log_prob_consistency(self):
        model = self._build()
        z, log_q = model.sample(jax.random.key(0), 64)
        assert_close(model.log_prob(z), log_q, atol=1e-3, rtol=1e-3)

    def test_reverse_kld_trains(self):
        import optax

        model = self._build(K=4)
        opt = optax.adam(3e-3)
        diff, rest = nft.partition(model)
        state = opt.init(diff)

        @jax.jit
        def step(diff, state, key):
            def loss_fn(d):
                return nft.combine(d, rest).reverse_kld(key, 512)

            loss, grads = jax.value_and_grad(loss_fn)(diff)
            updates, state = opt.update(grads, state, diff)
            return optax.apply_updates(diff, updates), state, loss

        losses = []
        key = jax.random.key(10)
        for i in range(40):
            key, sub = jax.random.split(key)
            diff, state, loss = step(diff, state, sub)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], f"{losses[0]} -> {losses[-1]}"


def test_constant_first_pass_inverse_exact():
    """The batch-1 broadcast first pass must reproduce the naive recursion
    (full-batch MADE pass per dim) bit-for-bit up to float assoc noise."""
    import numpy as np
    from normflows_tpu import flows

    layer = flows.MaskedAffineAutoregressive.create(
        jax.random.key(3), features=4, hidden_features=64, num_blocks=2
    )
    x = jax.random.normal(jax.random.key(4), (37, 4))

    # naive reference recursion (reference autoregressive.py:29-38 semantics)
    outputs = jnp.zeros_like(x)
    for _ in range(4):
        params = layer.autoregressive_net(outputs, None)
        outputs, logabsdet = layer._elementwise_inverse(x, params)

    z, ld = layer.inverse(x)
    np.testing.assert_allclose(np.asarray(z), np.asarray(outputs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(logabsdet), atol=1e-6)


def test_constant_first_pass_gradients_exact():
    """Weight gradients through the broadcast first pass match the naive path."""
    import numpy as np
    import normflows_tpu as nft
    from normflows_tpu import flows

    layer = flows.MaskedAffineAutoregressive.create(
        jax.random.key(5), features=3, hidden_features=32, num_blocks=1
    )
    x = jax.random.normal(jax.random.key(6), (19, 3))
    diff, rest = nft.partition(layer)

    def loss_opt(d):
        z, ld = nft.combine(d, rest).inverse(x)
        return jnp.sum(z**2) + jnp.sum(ld)

    def loss_naive(d):
        lay = nft.combine(d, rest)
        outputs = jnp.zeros_like(x)
        for _ in range(3):
            params = lay.autoregressive_net(outputs, None)
            outputs, ld = lay._elementwise_inverse(x, params)
        return jnp.sum(outputs**2) + jnp.sum(ld)

    g_opt = jax.grad(loss_opt)(diff)
    g_naive = jax.grad(loss_naive)(diff)
    for a, b in zip(jax.tree.leaves(g_opt), jax.tree.leaves(g_naive)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestSlicedInverseLargeD:
    """At D > 8 the sequential inverse takes the SLICED path (per-step
    final-layer + elementwise slicing, flows/affine/autoregressive.py
    _inverse_sliced).  It must agree with the naive full-width recursion —
    the reference semantics (autoregressive.py:29-38) — in values AND
    gradients, at D=64 (round-4 review demand)."""

    D = 64

    def _naive_inverse(self, layer, x):
        outputs = jnp.zeros_like(x)
        for _ in range(x.shape[1]):
            params = layer.autoregressive_net(outputs, None)
            outputs, ld = layer._elementwise_inverse(x, params)
        return outputs, ld

    @pytest.mark.parametrize("permute_mask", [False, True])
    def test_maf_values_match_naive(self, permute_mask):
        layer = flows.MaskedAffineAutoregressive.create(
            jax.random.key(3), features=self.D, hidden_features=48,
            num_blocks=1, random_mask=False,
        )
        if permute_mask:
            # permuted degrees via the NSF-style MADE constructor
            from normflows_tpu.nets import MADE
            made = MADE.create(
                jax.random.key(3), features=self.D, hidden_features=48,
                num_blocks=1, output_multiplier=2, permute_mask=True,
                rng_seed=7)
            layer = layer.replace(autoregressive_net=made)
        x = jax.random.normal(jax.random.key(4), (33, self.D))
        assert layer._sliced_inverse_ok(x, False)
        z_naive, ld_naive = self._naive_inverse(layer, x)
        z, ld = layer.inverse(x)
        np.testing.assert_allclose(np.asarray(z), np.asarray(z_naive),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_naive),
                                   atol=1e-4, rtol=1e-4)
        # round-trip sanity
        x2, ld_f = layer.forward(z)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)

    def test_rqs_values_match_naive(self):
        layer = flows.AutoregressiveRationalQuadraticSpline.create(
            jax.random.key(5), self.D, 1, 48, num_bins=6, permute_mask=True,
            init_identity=False,
        ).mprqat
        x = jax.random.normal(jax.random.key(6), (33, self.D))
        assert layer._sliced_inverse_ok(x, False)
        z_naive, ld_naive = self._naive_inverse(layer, x)
        z, ld = layer.inverse(x)
        np.testing.assert_allclose(np.asarray(z), np.asarray(z_naive),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_naive),
                                   atol=1e-4, rtol=1e-4)

    def test_rqs_gradients_match_naive(self):
        import normflows_tpu as nft

        layer = flows.AutoregressiveRationalQuadraticSpline.create(
            jax.random.key(7), 16, 1, 32, num_bins=4, permute_mask=True,
            init_identity=False,
        ).mprqat
        x = jax.random.normal(jax.random.key(8), (17, 16))
        diff, rest = nft.partition(layer)

        def loss_sliced(d):
            z, ld = nft.combine(d, rest).inverse(x)
            return jnp.sum(z**2) + jnp.sum(ld)

        def loss_naive(d):
            lay = nft.combine(d, rest)
            outputs = jnp.zeros_like(x)
            for _ in range(16):
                params = lay.autoregressive_net(outputs, None)
                outputs, ld = lay._elementwise_inverse(x, params)
            return jnp.sum(outputs**2) + jnp.sum(ld)

        g_s = jax.grad(loss_sliced)(diff)
        g_n = jax.grad(loss_naive)(diff)
        for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_n)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3)

    def test_conditional_rqs_matches_naive(self):
        """Conditional large-D models take the sliced path too (round 5):
        the context projections are constant across the D passes and enter
        via the precomputed cache (nets/made.py context_cache_t).  Values,
        log-dets, and gradients (incl. the context projections') must match
        the naive recursion with the SAME context."""
        import normflows_tpu as nft

        D = 16
        layer = flows.AutoregressiveRationalQuadraticSpline.create(
            jax.random.key(9), D, 2, 32, num_context_channels=3, num_bins=4,
            permute_mask=True, init_identity=False,
        ).mprqat
        x = jax.random.normal(jax.random.key(10), (17, D))
        ctx = jax.random.normal(jax.random.key(11), (17, 3))
        assert layer._sliced_inverse_ok(x, False, ctx)

        def naive(lay):
            outputs = jnp.zeros_like(x)
            for _ in range(D):
                params = lay.autoregressive_net(outputs, ctx)
                outputs, ld = lay._elementwise_inverse(x, params)
            return outputs, ld

        z_naive, ld_naive = naive(layer)
        z, ld = layer.inverse(x, ctx)
        np.testing.assert_allclose(np.asarray(z), np.asarray(z_naive),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_naive),
                                   atol=1e-4, rtol=1e-4)
        # context must influence the result (guard against a cache that
        # silently drops it)
        z0, _ = layer.inverse(x, 0 * ctx)
        assert float(jnp.max(jnp.abs(z0 - z))) > 1e-4

        diff, rest = nft.partition(layer)

        def loss_sliced(d):
            z, ld = nft.combine(d, rest).inverse(x, ctx)
            return jnp.sum(z**2) + jnp.sum(ld)

        def loss_naive(d):
            z, ld = naive(nft.combine(d, rest))
            return jnp.sum(z**2) + jnp.sum(ld)

        g_s = jax.grad(loss_sliced)(diff)
        g_n = jax.grad(loss_naive)(diff)
        for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_n)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3)

    def test_conditional_unbatched_context_matches_naive(self):
        """A 1-D (unbatched) context broadcasts over the batch in the
        general path; the cached transposed paths must match — including
        the treacherous B == hidden_features shape, where a transposed
        (H, B) + (H,) add broadcasts along the WRONG axis without erroring
        (round-5 review regression: measured max|diff| 1.62 before the
        atleast_2d fix)."""
        H = 32
        layer = flows.MaskedAffineAutoregressive.create(
            jax.random.key(20), features=12, hidden_features=H,
            context_features=4, num_blocks=1,
        )
        ctx1d = jax.random.normal(jax.random.key(21), (4,))
        for B in (5, H):  # H==B is the silent-corruption shape
            x = jax.random.normal(jax.random.key(22), (B, 12))
            outputs = jnp.zeros_like(x)
            for _ in range(12):
                params = layer.autoregressive_net(outputs, ctx1d)
                outputs, ld_naive = layer._elementwise_inverse(x, params)
            z, ld = layer.inverse(x, ctx1d)
            np.testing.assert_allclose(np.asarray(z), np.asarray(outputs),
                                       atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_naive),
                                       atol=1e-4, rtol=1e-4)

    def test_conditional_maf_matches_naive(self):
        layer = flows.MaskedAffineAutoregressive.create(
            jax.random.key(12), features=self.D, hidden_features=48,
            context_features=4, num_blocks=1,
        )
        x = jax.random.normal(jax.random.key(13), (9, self.D))
        ctx = jax.random.normal(jax.random.key(14), (9, 4))
        assert layer._sliced_inverse_ok(x, False, ctx)
        outputs = jnp.zeros_like(x)
        for _ in range(self.D):
            params = layer.autoregressive_net(outputs, ctx)
            outputs, ld_naive = layer._elementwise_inverse(x, params)
        z, ld = layer.inverse(x, ctx)
        np.testing.assert_allclose(np.asarray(z), np.asarray(outputs),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_naive),
                                   atol=1e-4, rtol=1e-4)


class TestDropoutThroughFlowAPI:
    """dropout_probability must be FUNCTIONAL through the flow API: passing
    a PRNG key to forward/inverse activates train-time dropout in the param
    nets (the functional analogue of the reference's model.train()); without
    a key the layer is the deterministic eval-mode function."""

    def test_coupled_rqs_dropout_applies_with_key(self):
        layer = flows.CoupledRationalQuadraticSpline.create(
            jax.random.key(0), 4, 2, 32, num_bins=4,
            dropout_probability=0.4, init_identity=False)
        z = jax.random.normal(jax.random.key(1), (16, 4))
        y1, _ = layer.forward(z, key=jax.random.key(10))
        y2, _ = layer.forward(z, key=jax.random.key(11))
        y3, _ = layer.forward(z)
        y4, _ = layer.forward(z)
        assert not np.allclose(np.asarray(y1), np.asarray(y2))  # stochastic
        np.testing.assert_allclose(np.asarray(y3), np.asarray(y4))  # eval det.

    def test_maf_dropout_applies_with_key(self):
        layer = flows.MaskedAffineAutoregressive.create(
            jax.random.key(0), features=4, hidden_features=32,
            dropout_probability=0.4)
        z = jax.random.normal(jax.random.key(1), (16, 4))
        y1, _ = layer.forward(z, key=jax.random.key(10))
        y2, _ = layer.forward(z, key=jax.random.key(11))
        y3, _ = layer.forward(z)
        assert not np.allclose(np.asarray(y1), np.asarray(y2))
        # inverse recursion also draws fresh masks per pass under a key
        x1, _ = layer.inverse(z, key=jax.random.key(10))
        x2, _ = layer.inverse(z, key=jax.random.key(11))
        assert not np.allclose(np.asarray(x1), np.asarray(x2))
        # and stays the deterministic eval function without one
        x3, _ = layer.inverse(z)
        x4, _ = layer.inverse(z)
        np.testing.assert_allclose(np.asarray(x3), np.asarray(x4))

    def test_zero_dropout_ignores_key(self):
        layer = flows.CoupledRationalQuadraticSpline.create(
            jax.random.key(0), 4, 2, 32, num_bins=4, init_identity=False)
        z = jax.random.normal(jax.random.key(1), (16, 4))
        y1, _ = layer.forward(z, key=jax.random.key(10))
        y2, _ = layer.forward(z)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
