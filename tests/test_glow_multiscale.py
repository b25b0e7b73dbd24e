"""Glow block + multiscale model tests (cf. reference flows/affine/glow_test.py,
core_test.py:180-196)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import normflows_tpu as nft
from normflows_tpu import flows, distributions, transforms
from normflows_tpu.utils import bits_per_dim
from tests.helpers import assert_close, check_forward_inverse

KEY = jax.random.key(0)


class TestGlowBlock:
    @pytest.mark.parametrize("channels", [3, 4])
    @pytest.mark.parametrize("scale", [True, False])
    @pytest.mark.parametrize("split_mode", ["channel", "channel_inv", "checkerboard"])
    @pytest.mark.parametrize("use_lu", [True, False])
    def test_roundtrip(self, channels, scale, split_mode, use_lu):
        block = flows.GlowBlock.create(
            KEY, channels, 16, scale=scale, split_mode=split_mode, use_lu=use_lu
        )
        z = jax.random.normal(jax.random.key(1), (2, channels, 4, 4))
        check_forward_inverse(block, z, atol=1e-3, rtol=1e-3)

    def test_single_channel(self):
        block = flows.GlowBlock.create(KEY, 1, 8, split_mode="checkerboard")
        z = jax.random.normal(jax.random.key(2), (2, 1, 4, 4))
        check_forward_inverse(block, z, atol=1e-3, rtol=1e-3)

    def test_net_actnorm(self):
        block = flows.GlowBlock.create(KEY, 4, 16, net_actnorm=True)
        z = jax.random.normal(jax.random.key(3), (2, 4, 4, 4))
        check_forward_inverse(block, z, atol=1e-3, rtol=1e-3)


def build_glow(L=2, K=2, hidden=16, input_shape=(3, 8, 8), num_classes=10,
               class_cond=True, key=KEY, with_transform=True):
    """Mini glow.ipynb config."""
    C, H, W = input_shape
    keys = jax.random.split(key, L * K + 1)
    q0, flow_levels, merges = [], [], []
    for i in range(L):
        # channel math from examples/glow.ipynb model cell
        cs = C * 2 ** (L + 1 - i)
        level_flows = [
            flows.GlowBlock.create(keys[i * K + j], cs, hidden,
                                   split_mode="channel", scale=True)
            for j in range(K)
        ]
        level_flows.append(flows.Squeeze())
        flow_levels.append(level_flows)
        if i > 0:
            merges.append(flows.Merge())
            latent_shape = (C * 2 ** (L - i), H // 2 ** (L - i), W // 2 ** (L - i))
        else:
            latent_shape = (C * 2 ** (L + 1), H // 2**L, W // 2**L)
        if class_cond:
            q0.append(distributions.ClassCondDiagGaussian.create(latent_shape, num_classes))
        else:
            q0.append(distributions.DiagGaussian.create(latent_shape))
    return nft.MultiscaleFlow.create(
        q0, flow_levels, merges,
        transform=transforms.Logit(alpha=0.05) if with_transform else None,
        class_cond=class_cond,
    )


class TestMultiscaleGlow:
    def test_latent_shapes_and_sample(self):
        model = build_glow()
        x, log_q = model.sample(jax.random.key(5), 4)
        assert x.shape == (4, 3, 8, 8)
        assert log_q.shape == (4,)
        assert jnp.all(jnp.isfinite(x))

    def test_log_prob_and_forward_kld(self):
        model = build_glow()
        x = jax.random.uniform(jax.random.key(6), (4, 3, 8, 8), minval=0.01,
                               maxval=0.99)
        y = jnp.array([0, 1, 2, 3])
        lp = model.log_prob(x, y)
        assert lp.shape == (4,)
        assert jnp.all(jnp.isfinite(lp))
        loss = model.forward_kld(x, y)
        assert jnp.isfinite(loss)

    def test_roundtrip_latent_data(self):
        model = build_glow(class_cond=False)
        x = jax.random.uniform(jax.random.key(7), (2, 3, 8, 8), minval=0.01,
                               maxval=0.99)
        z_list, ld_inv = model.inverse_and_log_det(x)
        x2, ld_fwd = model.forward_and_log_det(z_list)
        assert_close(x2, x, atol=1e-3, rtol=1e-3)
        assert_close(ld_fwd + ld_inv, jnp.zeros(2), atol=1e-2, rtol=1e-3)

    def test_sample_log_prob_consistency(self):
        model = build_glow(class_cond=False)
        x, log_q = model.sample(jax.random.key(8), 4)
        log_q2 = model.log_prob(x)
        assert_close(log_q, log_q2, atol=1e-2, rtol=1e-3)

    def test_temperature(self):
        model = build_glow()
        x, _ = model.sample(jax.random.key(9), 2, temperature=0.7)
        assert jnp.all(jnp.isfinite(x))
        m2 = model.set_temperature(0.5)
        assert m2.q0[0].temperature == 0.5
        m3 = m2.reset_temperature()
        assert m3.q0[0].temperature is None

    def test_actnorm_init(self):
        model = build_glow(class_cond=False)
        x = jax.random.uniform(jax.random.key(10), (8, 3, 8, 8), minval=0.01,
                               maxval=0.99)
        model2 = model.init_actnorm(x)
        # all ActNorms initialized
        inits = [
            bool(f.flows[-1].initialized)
            for level in model2.flows
            for f in level
            if isinstance(f, flows.GlowBlock)
        ]
        assert all(inits)
        lp = model2.log_prob(x)
        assert jnp.all(jnp.isfinite(lp))

    def test_bits_per_dim(self):
        # bitsPerDim's logit correction assumes the model consumes logit-space
        # data directly (utils/eval.py:26-29); no Logit transform in the model.
        model = build_glow(with_transform=False)
        x = jax.random.normal(jax.random.key(11), (4, 3, 8, 8))
        y = jnp.array([0, 1, 2, 3])
        b = bits_per_dim(model, x, y)
        assert b.shape == (4,)
        assert jnp.all(jnp.isfinite(b))

    def test_forward_kld_gradient(self):
        model = build_glow(L=1, K=1, input_shape=(3, 4, 4), class_cond=False)
        x = jax.random.uniform(jax.random.key(12), (4, 3, 4, 4), minval=0.01,
                               maxval=0.99)
        diff, rest = nft.partition(model)
        g = jax.grad(lambda d: nft.combine(d, rest).forward_kld(x))(diff)
        leaves = jax.tree.leaves(g)
        assert leaves and all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


def test_multiscale_save_load_roundtrip(tmp_path):
    """MultiscaleFlow.save/.load (core.py:618-632) log_prob identical."""
    import numpy as np
    model = build_glow()
    x = jax.random.uniform(jax.random.key(7), (3, 3, 8, 8),
                           minval=0.01, maxval=0.99)
    y = jnp.array([0, 1, 2])
    p = str(tmp_path / "ms.pkl")
    model.save(p)
    m2 = nft.MultiscaleFlow.load(p)
    np.testing.assert_allclose(
        np.asarray(model.log_prob(x, y)), np.asarray(m2.log_prob(x, y)),
        rtol=0, atol=0)
