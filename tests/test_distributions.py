"""Distribution contract tests (cf. normflows/distributions/*_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normflows_tpu import distributions as D
from normflows_tpu.nets import MLP
from tests.helpers import assert_close, check_dist

KEY = jax.random.key(0)


class TestDiagGaussian:
    def test_contract(self):
        dist = D.DiagGaussian.create((4,))
        z, log_p, log_p2 = check_dist(dist, 8, event_shape=(4,))
        assert_close(log_p, log_p2, atol=1e-5)

    def test_standard_normal_value(self):
        dist = D.DiagGaussian.create((2,))
        z = jnp.zeros((1, 2))
        assert_close(dist.log_prob(z), -np.log(2 * np.pi))

    def test_temperature(self):
        dist = D.DiagGaussian.create((2,)).replace(temperature=0.5)
        z = dist.sample(KEY, 2000)
        assert float(jnp.std(z)) < 0.7


class TestConditionalDiagGaussian:
    def test_contract(self):
        enc = MLP.create(KEY, [3, 16, 8])
        dist = D.ConditionalDiagGaussian.create((4,), enc)
        ctx = jax.random.normal(jax.random.key(1), (6, 3))
        z, log_p, log_p2 = check_dist(dist, 6, context=ctx, event_shape=(4,))
        assert_close(log_p, log_p2, atol=1e-5)


class TestUniform:
    def test_contract(self):
        dist = D.Uniform.create((3,), low=-2.0, high=2.0)
        z, log_p, log_p2 = check_dist(dist, 5)
        assert_close(log_p, log_p2)
        assert jnp.all(jnp.abs(z) <= 2.0)
        out = dist.log_prob(jnp.full((1, 3), 5.0))
        assert out[0] == -jnp.inf


class TestUniformGaussian:
    def test_contract(self):
        dist = D.UniformGaussian.create(2, [1], jnp.array([1.0, 2 * np.pi]))
        z, log_p, log_p2 = check_dist(dist, 10, event_shape=(2,))
        assert_close(log_p, log_p2, atol=1e-5)
        # uniform dim bounded
        zz = dist.sample(KEY, 4000)
        assert jnp.all(jnp.abs(zz[:, 1]) <= np.pi + 1e-5)
        assert float(jnp.std(zz[:, 0])) == pytest.approx(1.0, abs=0.05)


class TestClassCond:
    def test_contract(self):
        dist = D.ClassCondDiagGaussian.create((4,), 3)
        y = jnp.array([0, 1, 2, 0, 1])
        z, log_p = dist.sample_and_log_prob(KEY, context=y)
        assert z.shape == (5, 4)
        assert_close(dist.log_prob(z, y), log_p, atol=1e-5)

    def test_onehot_matches_int(self):
        dist = D.ClassCondDiagGaussian.create((4,), 3)
        dist = dist.replace(loc=jax.random.normal(KEY, (4, 3)))
        y = jnp.array([0, 2])
        z = jax.random.normal(jax.random.key(1), (2, 4))
        a = dist.log_prob(z, y)
        b = dist.log_prob(z, jax.nn.one_hot(y, 3))
        assert_close(a, b)


class TestGlowBase:
    @pytest.mark.parametrize("num_classes", [None, 5])
    def test_contract(self, num_classes):
        dist = D.GlowBase.create((3, 4, 4), num_classes=num_classes)
        ctx = jnp.array([0, 1, 2]) if num_classes else None
        z, log_p = dist.sample_and_log_prob(KEY, 3, ctx)
        assert z.shape == (3, 3, 4, 4)
        assert_close(dist.log_prob(z, ctx), log_p, atol=1e-4)


class TestAffineGaussian:
    @pytest.mark.parametrize("num_classes", [None, 4])
    def test_contract(self, num_classes):
        dist = D.AffineGaussian.create((8,), (8,), num_classes=num_classes)
        ctx = jnp.array([0, 3]) if num_classes else None
        z, log_p = dist.sample_and_log_prob(KEY, 2, ctx)
        assert z.shape == (2, 8)
        assert_close(dist.log_prob(z, ctx), log_p, atol=1e-4)


class TestGaussianMixture:
    def test_contract(self):
        dist = D.GaussianMixture.create(3, 2, key=KEY)
        z, log_p, log_p2 = check_dist(dist, 6, event_shape=(2,))
        assert_close(log_p, log_p2, atol=1e-5)


class TestGaussianPCA:
    def test_contract(self):
        dist = D.GaussianPCA.create(4, latent_dim=2, key=KEY)
        z, log_p, log_p2 = check_dist(dist, 6, event_shape=(4,))
        assert_close(log_p, log_p2, atol=1e-4)


class TestTargets:
    def test_two_moons(self):
        t = D.TwoMoons()
        lp = t.log_prob(jnp.array([[2.0, 0.0], [-2.0, 0.0]]))
        assert lp.shape == (2,)
        assert_close(lp[0], lp[1], atol=1e-5)  # symmetric modes
        samples = t.sample(KEY, 100)
        assert samples.shape == (100, 2)
        assert jnp.all(jnp.isfinite(samples))
        # samples concentrated near the ring of radius 2
        norms = jnp.linalg.norm(samples, axis=1)
        assert float(jnp.mean(jnp.abs(norms - 2.0))) < 0.5

    def test_circular_gmm(self):
        t = D.CircularGaussianMixture()
        s = t.sample(KEY, 50)
        assert s.shape == (50, 2)
        assert t.log_prob(s).shape == (50,)

    def test_ring_mixture(self):
        t = D.RingMixture()
        assert t.log_prob(jnp.zeros((3, 2))).shape == (3,)

    def test_gaussian_von_mises(self):
        t = D.GaussianVonMises()
        x = jnp.array([[0.0, 0.0]])
        # p(0,0) = exp(1)/( (2 pi)^1.5 I0(1) )
        expected = 1.0 + t.log_const
        assert_close(t.log_prob(x)[0], expected, atol=1e-5)
        s = t.sample(jax.random.key(3), 200)
        assert s.shape == (200, 2)
        assert jnp.all(jnp.abs(s[:, 1]) <= np.pi)

    def test_two_independent(self):
        t = D.TwoIndependent(target1=D.TwoMoons(), target2=D.TwoMoons())
        z = jax.random.normal(KEY, (4, 4))
        assert t.log_prob(z).shape == (4,)
        s = t.sample(KEY, 10)
        assert s.shape == (10, 4)

    def test_conditional_gaussian_target(self):
        t = D.ConditionalDiagGaussianTarget()
        ctx = jnp.concatenate([jnp.zeros((5, 2)), jnp.ones((5, 2))], axis=1)
        z = t.sample(KEY, 5, ctx)
        assert z.shape == (5, 2)
        lp = t.log_prob(z, ctx)
        ref = -np.log(2 * np.pi) - 0.5 * jnp.sum(z**2, axis=1)
        assert_close(lp, ref, atol=1e-5)
