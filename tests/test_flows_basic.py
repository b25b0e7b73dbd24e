"""Round-trip property tests for the basic flow zoo (cf. reference colocated
*_test.py files: coupling, mixing, reshape, normalization, planar, periodic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import normflows_tpu as nft
from normflows_tpu import flows
from normflows_tpu.nets import MLP
from tests.helpers import (
    assert_close,
    check_forward_inverse,
    check_inverse_forward,
    check_forward,
)


KEY = jax.random.key(42)


def rand(shape, key=KEY):
    return jax.random.normal(key, shape)


class TestAffineConst:
    def test_roundtrip(self):
        for shape in [(4,), (3, 4, 4)]:
            flow = flows.AffineConstFlow.create(shape)
            flow = flow.replace(
                s=0.3 * rand((1, *shape)), t=0.1 * rand((1, *shape)))
            check_forward_inverse(flow, rand((5, *shape)))

    def test_broadcast_logdet(self):
        # per-channel s broadcast over spatial dims multiplies log-det
        flow = flows.AffineConstFlow.create((3, 1, 1))
        flow = flow.replace(s=jnp.ones((1, 3, 1, 1)) * 0.5)
        z = rand((2, 3, 4, 4))
        _, ld = flow.forward(z)
        assert_close(ld, jnp.full(2, 0.5 * 3 * 16))


class TestCCAffineConst:
    def test_roundtrip(self):
        flow = flows.CCAffineConst.create((6,), num_classes=3)
        flow = flow.replace(
            s_cc=0.1 * rand((3, 6)), t_cc=0.1 * rand((3, 6)))
        y = jax.nn.one_hot(jnp.array([0, 2, 1, 0]), 3)
        z = rand((4, 6))
        out, ld_f = flow.forward(z, y)
        rec, ld_i = flow.inverse(out, y)
        assert_close(rec, z)
        assert_close(ld_f + ld_i, jnp.zeros(4))


class TestAffineCouplingBlock:
    @pytest.mark.parametrize("scale_map", ["exp", "sigmoid", "sigmoid_inv"])
    @pytest.mark.parametrize("scale", [True, False])
    def test_roundtrip(self, scale_map, scale):
        if not scale and scale_map != "exp":
            pytest.skip("additive mode ignores scale_map")
        D = 6
        out_mult = 2 if scale else 1
        pm = MLP.create(KEY, [D // 2, 32, (D // 2) * out_mult], init_zeros=False)
        flow = flows.AffineCouplingBlock.create(pm, scale=scale, scale_map=scale_map)
        check_forward_inverse(flow, rand((7, D)))

    def test_identity_init(self):
        D = 4
        pm = MLP.create(KEY, [D // 2, 16, D], init_zeros=True)
        flow = flows.AffineCouplingBlock.create(pm, scale=True, scale_map="exp")
        z = rand((3, D))
        out, ld = flow.forward(z)
        assert_close(out, z)
        assert_close(ld, jnp.zeros(3))


class TestMaskedAffineFlow:
    def test_roundtrip(self):
        D = 4
        b = nft.utils.create_alternating_binary_mask(D)
        s = MLP.create(jax.random.key(1), [D, 32, D])
        t = MLP.create(jax.random.key(2), [D, 32, D])
        flow = flows.MaskedAffineFlow.create(b, t=t, s=s)
        check_forward_inverse(flow, rand((5, D)))


class TestActNorm:
    def test_data_dep_init(self):
        flow = flows.ActNorm.create((4,))
        x = 2.0 + 3.0 * rand((256, 4))
        flow2, z = flow.data_dep_init(x)
        assert bool(flow2.initialized)
        assert_close(jnp.mean(z, 0), jnp.zeros(4), atol=1e-4)
        assert_close(jnp.std(z, 0, ddof=1), jnp.ones(4), atol=1e-3, rtol=1e-3)
        check_forward_inverse(flow2, rand((5, 4)))

    def test_image_shape(self):
        flow = flows.ActNorm.create((3, 1, 1))
        x = rand((16, 3, 8, 8))
        flow2, _ = flow.data_dep_init(x)
        check_forward_inverse(flow2, rand((2, 3, 8, 8)))


class TestBatchNorm:
    def test_forward(self):
        flow = flows.BatchNorm()
        z, ld = check_forward(flow, rand((64, 5)))
        assert_close(jnp.mean(z, 0), jnp.zeros(5), atol=1e-5)


class TestPermute:
    @pytest.mark.parametrize("mode", ["shuffle", "swap"])
    def test_roundtrip(self, mode):
        flow = flows.Permute.create(6, mode=mode)
        check_forward_inverse(flow, rand((4, 6)))


class TestInvertible1x1Conv:
    @pytest.mark.parametrize("use_lu", [True, False])
    def test_roundtrip(self, use_lu):
        flow = flows.Invertible1x1Conv.create(4, use_lu=use_lu)
        check_forward_inverse(flow, rand((2, 4, 5, 5)), atol=1e-3, rtol=1e-3)

    def test_logdet_matches_slogdet(self):
        flow = flows.Invertible1x1Conv.create(4, use_lu=True)
        L, U = flow._lu_factors()
        W = flow.P @ L @ U
        _, ref = jnp.linalg.slogdet(W)
        z = rand((2, 4, 3, 3))
        _, ld = flow.inverse(z)
        assert_close(ld, jnp.full(2, ref * 9), atol=1e-4)


class TestInvertibleAffine:
    @pytest.mark.parametrize("use_lu", [True, False])
    def test_roundtrip(self, use_lu):
        flow = flows.InvertibleAffine.create(5, use_lu=use_lu)
        check_forward_inverse(flow, rand((3, 5)), atol=1e-3, rtol=1e-3)


class TestLULinearPermute:
    def test_roundtrip(self):
        flow = flows.LULinearPermute.create(6)
        check_forward_inverse(flow, rand((4, 6)))

    def test_identity_init(self):
        flow = flows.LULinearPermute.create(6)
        z = rand((4, 6))
        out, ld = flow.inverse(z)
        # identity up to the permutation
        assert_close(jnp.sort(out, axis=1), jnp.sort(z, axis=1), atol=1e-5)
        assert_close(ld, jnp.zeros(4), atol=1e-5)


class TestSplitMergeSqueeze:
    @pytest.mark.parametrize(
        "mode", ["channel", "channel_inv", "checkerboard", "checkerboard_inv"]
    )
    def test_split_roundtrip(self, mode):
        split = flows.Split(mode=mode)
        z = rand((3, 4, 6, 6))
        pair, _ = split.forward(z)
        rec, _ = split.inverse(pair)
        assert_close(rec, z)

    def test_merge_is_reversed_split(self):
        merge = flows.Merge(mode="channel")
        z1, z2 = rand((3, 2, 4, 4)), rand((3, 2, 4, 4), jax.random.key(9))
        z, _ = merge.forward([z1, z2])
        (r1, r2), _ = merge.inverse(z)
        assert_close(r1, z1)
        assert_close(r2, z2)

    def test_squeeze_roundtrip(self):
        sq = flows.Squeeze()
        z = rand((2, 8, 4, 4))
        out, _ = sq.forward(z)
        assert out.shape == (2, 2, 8, 8)
        rec, _ = sq.inverse(out)
        assert_close(rec, z)


class TestPlanarRadial:
    def test_planar_leaky_roundtrip(self):
        flow = flows.Planar.create((4,), act="leaky_relu")
        check_forward_inverse(flow, rand((5, 4)))

    def test_planar_tanh_forward(self):
        flow = flows.Planar.create((4,), act="tanh")
        check_forward(flow, rand((5, 4)))

    def test_radial_forward(self):
        flow = flows.Radial.create((4,))
        check_forward(flow, rand((5, 4)))


class TestPeriodic:
    def test_wrap(self):
        flow = flows.PeriodicWrap.create([1], bound=jnp.pi)
        z = rand((5, 2)) * 5
        out, _ = flow.inverse(z)
        assert jnp.all(jnp.abs(out[:, 1]) <= jnp.pi + 1e-6)

    def test_shift_roundtrip(self):
        flow = flows.PeriodicShift.create([0], bound=jnp.pi, shift=1.0)
        z = jax.random.uniform(KEY, (5, 2), minval=-jnp.pi, maxval=jnp.pi)
        out, _ = flow.forward(z)
        rec, _ = flow.inverse(out)
        assert_close(rec, z, atol=1e-5)


class TestTransforms:
    def test_logit_roundtrip(self):
        flow = nft.transforms.Logit()
        z = rand((5, 3))
        check_forward_inverse(flow, z, atol=1e-3, rtol=1e-3)

    def test_shift(self):
        flow = nft.transforms.Shift()
        check_forward_inverse(flow, rand((5, 3)))


class TestComposition:
    def test_composite(self):
        layers = [flows.Permute.create(4, mode="swap"),
                  flows.AffineConstFlow.create((4,))]
        comp = flows.Composite(flows=tuple(layers))
        check_forward_inverse(comp, rand((5, 4)))

    def test_reverse(self):
        flow = flows.AffineConstFlow.create((4,)).replace(
            s=0.2 * rand((1, 4)), t=rand((1, 4)))
        rev = flows.Reverse(flow=flow)
        z = rand((5, 4))
        a, ld_a = flow.inverse(z)
        b, ld_b = rev.forward(z)
        assert_close(a, b)
        assert_close(ld_a, ld_b)

    def test_scan_chain_matches_python_loop(self):
        keys = jax.random.split(KEY, 4)
        layers = [
            flows.Planar.create((4,), act="leaky_relu", key=k) for k in keys
        ]
        chain = flows.ScanChain.create(layers)
        comp = flows.Composite(flows=tuple(layers))
        z = rand((5, 4))
        a, ld_a = comp.forward(z)
        b, ld_b = chain.forward(z)
        assert_close(a, b, atol=1e-5)
        assert_close(ld_a, ld_b, atol=1e-5)
        a, ld_a = comp.inverse(z)
        b, ld_b = chain.inverse(z)
        assert_close(a, b, atol=1e-5)
        assert_close(ld_a, ld_b, atol=1e-5)

    def test_scan_chain_remat_same_values_and_grads(self):
        """ScanChain(remat=True) recomputes activations in the backward pass
        (jax.checkpoint around the scan body) — values AND gradients must be
        identical to the stored-activation chain."""
        keys = jax.random.split(KEY, 6)
        layers = [
            flows.Planar.create((4,), act="leaky_relu", key=k) for k in keys
        ]
        plain = flows.ScanChain.create(layers)
        remat = flows.ScanChain.create(layers, remat=True)
        z = rand((5, 4))

        def loss(chain):
            out, ld = chain.forward(z)
            return jnp.sum(out**2) + jnp.sum(ld)

        lp, gp = jax.value_and_grad(loss)(plain)
        lr, gr = jax.value_and_grad(loss)(remat)
        assert_close(lp, lr, atol=1e-6)
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
            assert_close(a, b, atol=1e-6)


class TestModuleSystem:
    def test_partition_combine(self):
        pm = MLP.create(KEY, [2, 8, 4])
        block = flows.AffineCouplingBlock.create(pm)
        perm = flows.Permute.create(4)
        model = flows.Composite(flows=(block, perm))
        diff, rest = nft.partition(model)
        recon = nft.combine(diff, rest)
        z = rand((3, 4))
        a, _ = model.forward(z)
        b, _ = recon.forward(z)
        assert_close(a, b)
        # int perm buffer must not be in diff
        diff_leaves = jax.tree.leaves(diff)
        assert all(jnp.issubdtype(l.dtype, jnp.inexact) for l in diff_leaves)

    def test_jit_grad(self):
        pm = MLP.create(KEY, [2, 8, 4])
        model = flows.AffineCouplingBlock.create(pm)
        z = rand((3, 4))

        @jax.jit
        def loss_fn(model, z):
            out, ld = model.forward(z)
            return jnp.sum(out**2) - jnp.sum(ld)

        g = jax.grad(lambda d, r: loss_fn(nft.combine(d, r), z))(*nft.partition(model))
        assert all(jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(g))
