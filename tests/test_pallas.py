"""Pallas kernel exactness tests vs the jnp reference implementation
(interpreter mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normflows_tpu.ops import splines as ref
from normflows_tpu.ops import spline_pallas as sp
from tests.helpers import assert_close

KEY = jax.random.key(0)


def make_inputs(B=300, D=3, K=8):
    x = jax.random.uniform(jax.random.key(1), (B, D), minval=-4, maxval=4)
    uw = jax.random.normal(jax.random.key(2), (B, D, K))
    uh = jax.random.normal(jax.random.key(3), (B, D, K))
    ud = jax.random.normal(jax.random.key(4), (B, D, K + 1))
    return x, uw, uh, ud


class TestSplinePallasKernel:
    @pytest.mark.parametrize("inverse", [False, True])
    @pytest.mark.parametrize(
        "tails,bound",
        [
            (ref.TAIL_LINEAR, 3.0),
            (ref.TAIL_CIRCULAR, float(np.pi)),
        ],
    )
    def test_matches_jnp_reference(self, inverse, tails, bound):
        x, uw, uh, ud = make_inputs()
        y_ref, ld_ref = ref.unconstrained_rational_quadratic_spline(
            x, uw, uh, ud, inverse=inverse, tail_codes=tails, tail_bound=bound
        )
        y_pal, ld_pal = sp.unconstrained_rqs_interpret(
            x, uw, uh, ud, inverse=inverse, tail_codes=tails, tail_bound=bound
        )
        assert_close(y_pal, y_ref, atol=2e-5, rtol=2e-5)
        assert_close(ld_pal, ld_ref, atol=2e-4, rtol=2e-4)

    def test_mixed_tails_tensor_bound(self):
        x, uw, uh, ud = make_inputs(D=3)
        codes = np.array([ref.TAIL_LINEAR, ref.TAIL_CIRCULAR, ref.TAIL_LINEAR])
        bounds = np.array([5.0, np.pi, 3.0], np.float32)
        y_ref, ld_ref = ref.unconstrained_rational_quadratic_spline(
            x, uw, uh, ud, tail_codes=codes, tail_bound=bounds
        )
        y_pal, ld_pal = sp.unconstrained_rqs_interpret(
            x, uw, uh, ud, tail_codes=codes, tail_bound=bounds
        )
        assert_close(y_pal, y_ref, atol=2e-5, rtol=2e-5)
        assert_close(ld_pal, ld_ref, atol=2e-4, rtol=2e-4)

    def test_nonaligned_sizes_padded(self):
        # N = 17 * 3 = 51 — far from a (8, 128) tile; padding must be exact
        x, uw, uh, ud = make_inputs(B=17, D=3, K=5)
        y_ref, ld_ref = ref.unconstrained_rational_quadratic_spline(
            x, uw, uh, ud, tail_codes=ref.TAIL_LINEAR, tail_bound=3.0
        )
        y_pal, ld_pal = sp.unconstrained_rqs_interpret(
            x, uw, uh, ud, tail_codes=ref.TAIL_LINEAR, tail_bound=3.0
        )
        assert_close(y_pal, y_ref, atol=2e-5, rtol=2e-5)
        assert_close(ld_pal, ld_ref, atol=2e-4, rtol=2e-4)

    def test_custom_vjp_matches_jnp_grads(self):
        x, uw, uh, ud = make_inputs(B=64, D=2, K=6)

        def loss_ref(x, uw, uh, ud):
            y, ld = ref.unconstrained_rational_quadratic_spline(
                x, uw, uh, ud, tail_codes=ref.TAIL_LINEAR, tail_bound=3.0
            )
            return jnp.sum(y**2) + jnp.sum(ld)

        def loss_pal(x, uw, uh, ud):
            y, ld = sp.unconstrained_rqs_interpret(
                x, uw, uh, ud, tail_codes=ref.TAIL_LINEAR, tail_bound=3.0
            )
            return jnp.sum(y**2) + jnp.sum(ld)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, uw, uh, ud)
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(x, uw, uh, ud)
        for a, b in zip(g_ref, g_pal):
            assert_close(a, b, atol=1e-3, rtol=1e-3)


class TestFusedMadePallas:
    """Fused residual-MADE MLP kernel (ops/made_pallas.py) vs the jnp path."""

    def _made(self, blocks=1, hidden=512, mult=31):
        from normflows_tpu.nets.made import MADE

        return MADE.create(
            jax.random.key(7), features=2, hidden_features=hidden,
            num_blocks=blocks, output_multiplier=mult, permute_mask=True,
            rng_seed=3,
        )

    @pytest.mark.parametrize("blocks", [1, 2])
    def test_forward_matches(self, blocks):
        from normflows_tpu.ops import made_pallas

        made = self._made(blocks=blocks)
        x = jax.random.normal(jax.random.key(8), (300, 2))
        assert made_pallas.fusable(made, x, None)
        ref_out = made(x)  # jnp path (fusion off by default)
        fused = made_pallas.made_apply_fused(made, x, interpret=True)
        assert_close(fused, ref_out, atol=1e-5)

    def test_gradients_match(self):
        import normflows_tpu as nft
        from normflows_tpu.ops import made_pallas

        made = self._made()
        x = jax.random.normal(jax.random.key(9), (300, 2))
        diff, rest = nft.partition(made)

        def loss(d, x, fused):
            m = nft.combine(d, rest)
            o = made_pallas.made_apply_fused(m, x, interpret=True) if fused else m(x)
            return (o ** 2).sum() + jnp.sin(o).sum()

        g_ref = jax.grad(loss, argnums=(0, 1))(diff, x, False)
        g_fus = jax.grad(loss, argnums=(0, 1))(diff, x, True)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
            assert_close(a, b, atol=2e-4)

    def test_fusable_gates(self):
        from normflows_tpu.nets.made import MADE
        from normflows_tpu.ops import made_pallas

        made = self._made()
        x = jax.random.normal(jax.random.key(10), (300, 2))
        # context / small batch / non-2D / odd hidden width all fall back
        assert not made_pallas.fusable(made, x, jnp.ones((300, 3)))
        assert not made_pallas.fusable(made, x[:16], None)
        assert not made_pallas.fusable(made, x[None], None)
        odd = MADE.create(jax.random.key(11), features=2, hidden_features=100,
                          num_blocks=1, output_multiplier=3)
        assert not made_pallas.fusable(odd, x, None)
        ff = MADE.create(jax.random.key(12), features=2, hidden_features=512,
                         num_blocks=1, output_multiplier=3,
                         use_residual_blocks=False)
        assert not made_pallas.fusable(ff, x, None)


class TestFusedMadeBf16:
    """bf16 mixed-precision path of the fused MADE kernel."""

    def _made_bf16(self, blocks=1):
        import normflows_tpu as nft
        from normflows_tpu.nets.made import MADE

        made = MADE.create(
            jax.random.key(13), features=2, hidden_features=512,
            num_blocks=blocks, output_multiplier=31, permute_mask=True,
            rng_seed=5,
        )
        return nft.utils.set_compute_dtype(made, "bfloat16")

    def test_fusable_and_forward_close_to_f32(self):
        from normflows_tpu.ops import made_pallas

        made = self._made_bf16()
        x = jax.random.normal(jax.random.key(14), (300, 2))
        assert made_pallas.fusable(made, x, None)
        fused = made_pallas.made_apply_fused(made, x, interpret=True)
        # oracle: the f32 jnp path; bf16 matmuls with f32 accumulation stay
        # within bf16 rounding of it
        import normflows_tpu as nft
        f32_made = nft.utils.set_compute_dtype(made, None)
        ref = f32_made(x)
        assert fused.dtype == jnp.float32
        assert_close(fused, ref, atol=0.15, rtol=0.05)
        # and it must be strictly closer to f32 than pure-bf16 XLA is allowed
        # to drift: compare against the XLA bf16 path too
        xla_bf16 = made(x).astype(jnp.float32)
        assert_close(fused, xla_bf16, atol=0.3, rtol=0.1)

    def test_gradients_finite_and_close(self):
        import normflows_tpu as nft
        from normflows_tpu.ops import made_pallas

        made = self._made_bf16()
        x = jax.random.normal(jax.random.key(15), (300, 2))
        diff, rest = nft.partition(made)

        def loss(d, fused):
            m = nft.combine(d, rest)
            o = made_pallas.made_apply_fused(m, x, interpret=True) if fused \
                else m(x).astype(jnp.float32)
            return (o ** 2).mean()

        g_fus = jax.grad(loss)(diff, True)
        g_xla = jax.grad(loss)(diff, False)
        for a, b in zip(jax.tree.leaves(g_fus), jax.tree.leaves(g_xla)):
            assert bool(jnp.all(jnp.isfinite(a)))
            assert_close(a, b, atol=5e-2, rtol=5e-2)


class TestSplineLargeBlocks:
    """The MAX_SUB (64, 128) block path used at flagship shapes."""

    def test_large_n_forward_and_grads_match(self):
        B, D, K = 8192, 2, 10  # N = 16384 >= MAX_SUB * LANE -> 64-row blocks
        x, uw, uh, ud = make_inputs(B=B, D=D, K=K)
        assert sp._pick_sub(B * D) == sp.MAX_SUB
        codes = np.array([ref.TAIL_LINEAR, ref.TAIL_CIRCULAR])
        bounds = np.array([5.0, np.pi], np.float32)
        y_ref, ld_ref = ref.unconstrained_rational_quadratic_spline(
            x, uw, uh, ud, inverse=True, tail_codes=codes, tail_bound=bounds
        )
        y_pal, ld_pal = sp.unconstrained_rqs_interpret(
            x, uw, uh, ud, inverse=True, tail_codes=codes, tail_bound=bounds
        )
        assert_close(y_pal, y_ref, atol=2e-5, rtol=2e-5)
        assert_close(ld_pal, ld_ref, atol=2e-4, rtol=2e-4)

        def loss_ref(x, uw, uh, ud):
            y, ld = ref.unconstrained_rational_quadratic_spline(
                x, uw, uh, ud, inverse=True, tail_codes=codes, tail_bound=bounds)
            return jnp.sum(jnp.sin(y)) + jnp.sum(ld)

        def loss_pal(x, uw, uh, ud):
            y, ld = sp.unconstrained_rqs_interpret(
                x, uw, uh, ud, inverse=True, tail_codes=codes, tail_bound=bounds)
            return jnp.sum(jnp.sin(y)) + jnp.sum(ld)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, uw, uh, ud)
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(x, uw, uh, ud)
        for a, b in zip(g_ref, g_pal):
            assert_close(a, b, atol=2e-3, rtol=2e-3)

    def test_just_below_threshold_uses_small_blocks(self):
        B, D, K = 100, 2, 6  # N = 200 < 8192
        assert sp._pick_sub(B * D) == sp.SUB
        x, uw, uh, ud = make_inputs(B=B, D=D, K=K)
        y_ref, ld_ref = ref.unconstrained_rational_quadratic_spline(
            x, uw, uh, ud, tail_codes=ref.TAIL_LINEAR, tail_bound=3.0
        )
        y_pal, ld_pal = sp.unconstrained_rqs_interpret(
            x, uw, uh, ud, tail_codes=ref.TAIL_LINEAR, tail_bound=3.0
        )
        assert_close(y_pal, y_ref, atol=2e-5, rtol=2e-5)


class TestSplineHandBackward:
    """The hand-structured backward kernel (spline_pallas._spline_block_bwd)
    vs jnp-reference autodiff, both directions, mixed tails incl. outside-
    interval elements."""

    @pytest.mark.parametrize("inverse", [False, True])
    def test_mixed_tail_grads_match(self, inverse):
        B, D, K = 96, 2, 10
        x, uw, uh, ud = make_inputs(B=B, D=D, K=K)
        x = x * 4.0  # push some elements outside the linear-tail interval
        codes = np.array([ref.TAIL_LINEAR, ref.TAIL_CIRCULAR])
        bounds = np.array([2.5, np.pi], np.float32)

        def loss_ref(x, uw, uh, ud):
            y, ld = ref.unconstrained_rational_quadratic_spline(
                x, uw, uh, ud, inverse=inverse, tail_codes=codes,
                tail_bound=bounds)
            return jnp.sum(jnp.sin(y)) + jnp.sum(1.3 * ld)

        def loss_pal(x, uw, uh, ud):
            y, ld = sp.unconstrained_rqs_interpret(
                x, uw, uh, ud, inverse=inverse, tail_codes=codes,
                tail_bound=bounds)
            return jnp.sum(jnp.sin(y)) + jnp.sum(1.3 * ld)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, uw, uh, ud)
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(x, uw, uh, ud)
        for a, b in zip(g_ref, g_pal):
            assert bool(jnp.all(jnp.isfinite(b)))
            assert_close(a, b, atol=2e-3, rtol=2e-3)


class TestTransposedSplinePipeline:
    """The zero-relayout AR fast path: MADE.apply_t + planar spline kernel
    (rqs_transposed_pallas), validated in interpret mode against the jnp
    reference path — outputs, log-dets, and parameter gradients."""

    def _layer(self):
        from normflows_tpu import flows

        return flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.key(3), 2, 1, 64, ind_circ=[1], num_bins=10,
            tail_bound=jnp.array([5.0, np.pi]), permute_mask=True, rng_seed=3,
        ).mprqat

    def _with_backend(self, mode, interpret, fn):
        from normflows_tpu.ops import backend

        backend.set_kernel_backend(mode)
        backend.set_pallas_interpret(interpret)
        try:
            return fn()
        finally:
            backend.set_kernel_backend("auto")
            backend.set_pallas_interpret(False)

    def test_made_apply_t_matches_call(self):
        inner = self._layer()
        x = jax.random.normal(jax.random.key(1), (64, 2))
        made = inner.autoregressive_net
        assert made.supports_t()
        assert_close(made.apply_t(x.T).T, made(x), atol=1e-5, rtol=1e-5)

    @pytest.mark.parametrize("direction", ["forward", "inverse"])
    def test_layer_outputs_match_jnp_path(self, direction):
        inner = self._layer()
        x = jax.random.normal(jax.random.key(1), (1024, 2)) * 2.0
        y_ref, ld_ref = self._with_backend(
            "xla", False, lambda: getattr(inner, direction)(x))
        assert not inner._transposed_ok(x, None)  # gate off under xla

        def run():
            assert inner._transposed_ok(x, None)
            return getattr(inner, direction)(x)

        y_t, ld_t = self._with_backend("pallas", True, run)
        assert_close(y_t, y_ref, atol=2e-5, rtol=2e-5)
        assert_close(ld_t, ld_ref, atol=2e-4, rtol=2e-4)

    def test_layer_gradients_match_jnp_path(self):
        import normflows_tpu as nf

        inner = self._layer()
        x = jax.random.normal(jax.random.key(1), (1024, 2)) * 2.0
        diff, rest = nf.partition(inner)

        def loss(d):
            y, ld = nf.combine(d, rest).inverse(x)
            return jnp.mean(jnp.sin(y)) + jnp.mean(ld)

        g_ref = self._with_backend("xla", False, lambda: jax.grad(loss)(diff))
        g_t = self._with_backend("pallas", True, lambda: jax.grad(loss)(diff))
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_t)):
            assert bool(jnp.all(jnp.isfinite(b)))
            assert_close(b, a, atol=2e-3, rtol=2e-3)

    def test_small_batch_falls_back(self):
        inner = self._layer()
        x = jax.random.normal(jax.random.key(1), (64, 2))
        assert not inner._transposed_ok(x, None)  # below the 1024 gate

    @pytest.mark.parametrize("direction", ["forward", "inverse"])
    def test_conditional_transposed_matches_jnp_path(self, direction):
        """Conditional models take the transposed pipeline too (round 5):
        the context is constant across recursion passes, so its projections
        enter as a precomputed cache (nets/made.py context_cache_t).  Both
        directions must match the jnp general path with the SAME context."""
        from normflows_tpu import flows

        inner = flows.AutoregressiveRationalQuadraticSpline.create(
            jax.random.key(11), 2, 1, 64, num_context_channels=3, num_bins=8,
            permute_mask=True, init_identity=False,
        ).mprqat
        x = jax.random.normal(jax.random.key(1), (1024, 2)) * 2.0
        ctx = jax.random.normal(jax.random.key(2), (1024, 3))
        y_ref, ld_ref = self._with_backend(
            "xla", False, lambda: getattr(inner, direction)(x, ctx))

        def run():
            assert inner._transposed_ok(x, ctx)
            return getattr(inner, direction)(x, ctx)

        y_t, ld_t = self._with_backend("pallas", True, run)
        assert_close(y_t, y_ref, atol=5e-5, rtol=5e-5)
        assert_close(ld_t, ld_ref, atol=5e-4, rtol=5e-4)
        # the context must actually matter (guard against a silently
        # context-dropping fast path)
        y0, _ = self._with_backend(
            "pallas", True, lambda: getattr(inner, direction)(x, 0 * ctx))
        assert float(jnp.max(jnp.abs(y0 - y_t))) > 1e-4

    def test_three_feature_transposed_inverse_matches(self):
        """D=3 engages the multi-pass loop after the batch-1 first pass
        (for _ in range(1, F)) — validate both directions vs the jnp path."""
        from normflows_tpu import flows

        inner = flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.key(5), 3, 1, 64, ind_circ=[2], num_bins=8,
            tail_bound=jnp.array([4.0, 4.0, np.pi]), permute_mask=True,
            rng_seed=5,
        ).mprqat
        x = jax.random.normal(jax.random.key(1), (1024, 3)) * 2.0
        for direction in ("forward", "inverse"):
            y_ref, ld_ref = self._with_backend(
                "xla", False, lambda: getattr(inner, direction)(x))
            y_t, ld_t = self._with_backend(
                "pallas", True, lambda: getattr(inner, direction)(x))
            assert_close(y_t, y_ref, atol=5e-5, rtol=5e-5,
                         msg=f"D=3 {direction}")
            assert_close(ld_t, ld_ref, atol=5e-4, rtol=5e-4,
                         msg=f"D=3 {direction} ld")


class TestDynCodesKernel:
    """unconstrained_rqs_pallas_dyncodes: the flat kernel with TRACED
    per-element codes/bounds (the sliced AR inverse's spline).  Must match
    the jnp reference in values and grads (interpret mode on CPU)."""

    def _inputs(self, N=640, K=6):
        x = jax.random.uniform(jax.random.key(1), (N,), minval=-4, maxval=4)
        uw = jax.random.normal(jax.random.key(2), (K, N)) * 0.3
        uh = jax.random.normal(jax.random.key(3), (K, N)) * 0.3
        ud = jax.random.normal(jax.random.key(4), (K + 1, N)) * 0.3
        codes = jnp.where(jnp.arange(N) % 2 == 0, ref.TAIL_LINEAR,
                          ref.TAIL_CIRCULAR).astype(jnp.int32)
        bounds = jnp.where(jnp.arange(N) % 2 == 0, 4.0, float(np.pi))
        return x, uw, uh, ud, codes, bounds

    @pytest.mark.parametrize("inverse", [False, True])
    def test_matches_jnp(self, inverse):
        x, uw, uh, ud, codes, bounds = self._inputs()
        y, ld = sp.unconstrained_rqs_pallas_dyncodes(
            x, uw, uh, ud, codes, bounds, inverse, interpret=True)
        y_ref, ld_ref = ref.unconstrained_rational_quadratic_spline(
            x[:, None], uw.T[:, None, :], uh.T[:, None, :], ud.T[:, None, :],
            inverse=inverse, tail_codes=codes[:, None],
            tail_bound=bounds[:, None])
        assert_close(y, y_ref[:, 0], atol=1e-5, rtol=1e-5)
        assert_close(ld, ld_ref[:, 0], atol=1e-4, rtol=1e-4)

    def test_grads_match_jnp(self):
        x, uw, uh, ud, codes, bounds = self._inputs(N=256)

        def loss_k(args):
            x_, uw_, uh_, ud_ = args
            y, ld = sp.unconstrained_rqs_pallas_dyncodes(
                x_, uw_, uh_, ud_, codes, bounds, True, interpret=True)
            return jnp.sum(y * jnp.arange(y.size)) + 2.0 * jnp.sum(ld)

        def loss_ref(args):
            x_, uw_, uh_, ud_ = args
            y, ld = ref.unconstrained_rational_quadratic_spline(
                x_[:, None], uw_.T[:, None, :], uh_.T[:, None, :],
                ud_.T[:, None, :], inverse=True, tail_codes=codes[:, None],
                tail_bound=bounds[:, None])
            return jnp.sum(y[:, 0] * jnp.arange(y.shape[0])) + 2.0 * jnp.sum(ld)

        g_k = jax.grad(loss_k)((x, uw, uh, ud))
        g_r = jax.grad(loss_ref)((x, uw, uh, ud))
        for a, b in zip(g_k, g_r):
            assert_close(a, b, atol=1e-3, rtol=1e-3)

    def test_nonaligned_padding(self):
        x, uw, uh, ud, codes, bounds = self._inputs(N=333)
        y, ld = sp.unconstrained_rqs_pallas_dyncodes(
            x, uw, uh, ud, codes, bounds, False, interpret=True)
        assert y.shape == (333,) and ld.shape == (333,)
        assert bool(jnp.all(jnp.isfinite(y)))
