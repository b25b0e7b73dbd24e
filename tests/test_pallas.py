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
