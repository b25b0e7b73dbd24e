"""Stochastic flows (MH/HMC), HAIS, VAE components (cf. reference
flows/stochastic_test.py, sampling/, distributions/encoder_test.py,
decoder_test.py, prior_test.py, core_test.py:199-230).

Adds statistical correctness checks for the MCMC kernels (the reference only
smoke-tests them, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import normflows_tpu as nft
from normflows_tpu import flows, distributions as D
from normflows_tpu.nets import MLP
from normflows_tpu.sampling import HAIS
from tests.helpers import assert_close

KEY = jax.random.key(0)


class TestMetropolisHastings:
    def test_shapes_and_invariance(self):
        target = D.DiagGaussian.create(2)
        proposal = D.DiagGaussianProposal.create((2,), 0.5)
        mh = flows.MetropolisHastings(target=target, proposal=proposal, steps=5)
        z = jax.random.normal(KEY, (32, 2))
        z_out, ld = mh.forward(z, key=jax.random.key(1))
        assert z_out.shape == z.shape and ld.shape == (32,)
        z_inv, _ = mh.inverse(z, key=jax.random.key(1))
        assert_close(z_out, z_inv)  # inverse == forward

    def test_missing_key_raises(self):
        """Regression (VERDICT r1 weak #1): keyless stochastic calls must fail
        loudly instead of silently reusing a fixed key(0)."""
        target = D.DiagGaussian.create(2)
        proposal = D.DiagGaussianProposal.create((2,), 0.5)
        mh = flows.MetropolisHastings(target=target, proposal=proposal, steps=2)
        z = jax.random.normal(KEY, (4, 2))
        with pytest.raises(ValueError, match="PRNG key"):
            mh.forward(z)
        hmc = flows.HamiltonianMonteCarlo.create(
            target, steps=2, log_step_size=jnp.full(2, -1.0),
            log_mass=jnp.zeros(2),
        )
        with pytest.raises(ValueError, match="PRNG key"):
            hmc.forward(z)
        # facade path: log_prob(x) with a stochastic layer and no key
        model = nft.NormalizingFlow.create(D.DiagGaussian.create(2), [mh])
        with pytest.raises(ValueError, match="PRNG key"):
            model.log_prob(z)

    def test_stationary_distribution(self):
        """Long MH chain from an offset start must match the target moments."""
        target = D.DiagGaussian.create(2)
        proposal = D.DiagGaussianProposal.create((2,), 1.0)
        mh = flows.MetropolisHastings(target=target, proposal=proposal, steps=200)
        z0 = 5.0 + jax.random.normal(KEY, (512, 2))
        z, _ = jax.jit(lambda z, k: mh.forward(z, key=k))(z0, jax.random.key(2))
        assert abs(float(jnp.mean(z))) < 0.15
        assert abs(float(jnp.std(z)) - 1.0) < 0.1


class TestHMC:
    def test_shapes(self):
        target = D.TwoMoons()
        hmc = flows.HamiltonianMonteCarlo.create(
            target, steps=5, log_step_size=jnp.full(2, -1.0),
            log_mass=jnp.zeros(2),
        )
        z = jax.random.normal(KEY, (16, 2))
        z_out, ld = hmc.forward(z, key=jax.random.key(3))
        assert z_out.shape == (16, 2) and ld.shape == (16,)

    def test_stationary_distribution(self):
        # steps * step_size chosen off the half-period resonance (pi) of the
        # unit Gaussian so chains decorrelate rather than oscillate
        target = D.DiagGaussian.create(2)
        hmc = flows.HamiltonianMonteCarlo.create(
            target, steps=5, log_step_size=jnp.full(2, np.log(0.4)),
            log_mass=jnp.zeros(2),
        )
        z = 4.0 + jax.random.normal(KEY, (512, 2))
        step = jax.jit(lambda z, k: hmc.forward(z, key=k)[0])
        key = jax.random.key(4)
        for _ in range(50):
            key, sub = jax.random.split(key)
            z = step(z, sub)
        assert abs(float(jnp.mean(z))) < 0.15
        assert abs(float(jnp.std(z)) - 1.0) < 0.1

    def test_grad_clipping(self):
        target = D.TwoMoons()
        hmc = flows.HamiltonianMonteCarlo.create(
            target, steps=2, log_step_size=jnp.full(2, -2.0),
            log_mass=jnp.zeros(2), max_abs_grad=1.0,
        )
        g = hmc.grad_log_p(jnp.ones((4, 2)) * 100)
        assert float(jnp.max(jnp.abs(g))) <= 1.0

    def test_gradients_wrt_step_size(self):
        target = D.DiagGaussian.create(2)
        hmc = flows.HamiltonianMonteCarlo.create(
            target, steps=3, log_step_size=jnp.full(2, -1.0), log_mass=jnp.zeros(2)
        )
        diff, rest = nft.partition(hmc)

        def loss(diff):
            m = nft.combine(diff, rest)
            z, ld = m.forward(jax.random.normal(KEY, (8, 2)), key=jax.random.key(5))
            return jnp.sum(z**2) + jnp.sum(ld)

        g = jax.grad(loss)(diff)
        assert bool(jnp.all(jnp.isfinite(g.log_step_size)))


class TestHAIS:
    def test_weighted_mean_estimate(self):
        """HAIS importance weights must estimate E_target[z] correctly."""
        prior = D.DiagGaussian.create(2)
        # target: N(2, 0.5^2 I), analytic via DiagGaussian with fixed params
        target = D.DiagGaussian.create(2).replace(
            loc=jnp.full((1, 2), 2.0), log_scale=jnp.full((1, 2), np.log(0.5))
        )
        betas = np.linspace(1.0, 0.0, 12)
        hais = HAIS.create(
            betas, prior, target, num_leapfrog=5,
            step_size=jnp.full(2, 0.3), log_mass=jnp.zeros(2),
        )
        samples, log_w = jax.jit(lambda k: hais.sample(k, 2048))(jax.random.key(6))
        w = jax.nn.softmax(log_w)
        mean_est = jnp.sum(w[:, None] * samples, axis=0)
        assert_close(mean_est, jnp.full(2, 2.0), atol=0.2, rtol=0.2)


class TestEncoders:
    def test_dirac(self):
        enc = D.Dirac()
        x = jax.random.normal(KEY, (5, 3))
        z, log_q = enc.sample_and_log_prob(KEY, x, 4)
        assert z.shape == (5, 4, 3) and log_q.shape == (5, 4)

    def test_uniform_encoder(self):
        enc = D.UniformEncoder()
        x = jax.random.normal(KEY, (5, 3))
        z, log_q = enc.sample_and_log_prob(KEY, x, 2)
        assert z.shape == (5, 2, 3)
        assert jnp.all((z >= 0) & (z <= 1))

    def test_const_diag_gaussian(self):
        enc = D.ConstDiagGaussian.create(np.zeros(3), np.ones(3))
        x = jax.random.normal(KEY, (5, 3))
        z, log_q = enc.sample_and_log_prob(KEY, x, 4)
        assert z.shape == (5, 4, 3) and log_q.shape == (5, 4)
        assert_close(enc.log_prob(z, x), log_q, atol=1e-5)

    def test_nn_diag_gaussian(self):
        net = MLP.create(KEY, [3, 16, 8])  # 4 mean + 4 logvar
        enc = D.NNDiagGaussian(net=net)
        x = jax.random.normal(KEY, (5, 3))
        z, log_q = enc.sample_and_log_prob(jax.random.key(1), x, 2)
        assert z.shape == (5, 2, 4) and log_q.shape == (5, 2)
        assert_close(enc.log_prob(z, x), log_q, atol=1e-4, rtol=1e-4)


class TestDecoders:
    def test_gaussian_decoder(self):
        net = MLP.create(KEY, [4, 16, 6])  # 3 mean + 3 logvar
        dec = D.NNDiagGaussianDecoder(net=net)
        z = jax.random.normal(KEY, (10, 4))
        x = jax.random.normal(jax.random.key(1), (5, 3))  # z = 2 samples per x
        lp = dec.log_prob(x, z)
        assert lp.shape == (10,)

    def test_bernoulli_decoder(self):
        net = MLP.create(KEY, [4, 16, 3])
        dec = D.NNBernoulliDecoder(net=net)
        z = jax.random.normal(KEY, (5, 4))
        x = (jax.random.uniform(jax.random.key(1), (5, 3)) > 0.5).astype(jnp.float32)
        lp = dec.log_prob(x, z)
        assert lp.shape == (5,)
        assert jnp.all(lp <= 0)


class TestPriors:
    @pytest.mark.parametrize(
        "prior",
        [
            D.TwoModes(loc=2.0, scale=0.2),
            D.Sinusoidal(scale=0.2, period=4.0),
            D.Sinusoidal_gap(scale=0.35, period=4.0),
            D.Sinusoidal_split(scale=0.4, period=4.0),
            D.Smiley(scale=0.2),
        ],
    )
    def test_log_prob_shape(self, prior):
        z = jax.random.normal(KEY, (7, 2))
        lp = prior.log_prob(z)
        assert lp.shape == (7,)
        assert jnp.all(jnp.isfinite(lp))

    def test_image_prior(self):
        img = np.zeros((8, 8))
        img[2:6, 2:6] = 1.0
        prior = D.ImagePrior.create(img)
        z = jnp.zeros((3, 2))
        assert prior.log_prob(z).shape == (3,)
        s = prior.sample(KEY, 64)
        assert s.shape == (64, 2)
        assert jnp.all(jnp.abs(s) <= 3.0)


class TestNormalizingFlowVAE:
    def test_forward_shapes(self):
        latent = 4
        enc_net = MLP.create(KEY, [8, 32, 2 * latent])
        dec_net = MLP.create(jax.random.key(1), [latent, 32, 8])
        prior = D.DiagGaussian.create(latent)
        q0 = D.NNDiagGaussian(net=enc_net)
        decoder = D.NNBernoulliDecoder(net=dec_net)
        layers = [
            flows.Planar.create((latent,), key=jax.random.key(i)) for i in range(3)
        ]
        vae = nft.NormalizingFlowVAE.create(prior, q0, layers, decoder)
        x = (jax.random.uniform(jax.random.key(2), (6, 8)) > 0.5).astype(jnp.float32)
        z, log_q, log_p = vae(jax.random.key(3), x, num_samples=5)
        assert z.shape == (6, 5, latent)
        assert log_q.shape == (6, 5)
        assert log_p.shape == (6, 5)
        # ELBO must be finite
        elbo = jnp.mean(log_p - log_q)
        assert jnp.isfinite(elbo)
