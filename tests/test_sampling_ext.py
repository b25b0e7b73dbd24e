"""Sampling extensions: step-size adaptation, SMC, NeuTra-HMC (new
TPU-native capabilities, SURVEY.md §7 item 8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import normflows_tpu as nft
from normflows_tpu import flows, distributions as D
from normflows_tpu.nets import MLP
from normflows_tpu.sampling import (
    adapt_step_size,
    AnnealedSMC,
    NeuTraHMC,
    systematic_resample,
    effective_sample_size,
)
from tests.helpers import assert_close

KEY = jax.random.key(0)


class TestStepSizeAdaptation:
    def test_converges_to_target_accept(self):
        target = D.DiagGaussian.create(4)
        hmc = flows.HamiltonianMonteCarlo.create(
            target, steps=5, log_step_size=jnp.full(4, np.log(2.0)),  # way too big
            log_mass=jnp.zeros(4),
        )
        z0 = jax.random.normal(KEY, (256, 4))
        tuned, info = jax.jit(
            lambda k, z: adapt_step_size(hmc, k, z, num_adapt=150)
        )(jax.random.key(1), z0)
        # a tuned step size for a unit Gaussian is well below 2.0
        assert float(jnp.exp(tuned.log_step_size[0])) < 1.5
        # late-phase acceptance near the 0.8 target
        late = float(jnp.mean(info["accept_rate"][-30:]))
        assert 0.6 < late < 0.95


class TestSystematicResample:
    def test_uniform_weights_keep_all(self):
        n = 64
        particles = jnp.arange(n, dtype=jnp.float32)[:, None]
        out, log_w = systematic_resample(KEY, jnp.zeros(n), particles)
        assert_close(jnp.sort(out[:, 0]), particles[:, 0])
        assert_close(log_w, jnp.zeros(n))

    def test_degenerate_weights_collapse(self):
        n = 64
        particles = jnp.arange(n, dtype=jnp.float32)[:, None]
        log_w = jnp.full(n, -jnp.inf).at[7].set(0.0)
        out, _ = systematic_resample(KEY, log_w, particles)
        assert_close(out[:, 0], jnp.full(n, 7.0))

    def test_ess(self):
        assert float(effective_sample_size(jnp.zeros(32))) == pytest.approx(32.0)
        lw = jnp.full(32, -jnp.inf).at[0].set(0.0)
        assert float(effective_sample_size(lw)) == pytest.approx(1.0)


class TestAnnealedSMC:
    def test_moments_and_evidence(self):
        proposal = D.DiagGaussian.create(2)
        # normalized target N(3, 0.7^2): log Z should be ~0
        target = D.DiagGaussian.create(2).replace(
            loc=jnp.full((1, 2), 3.0), log_scale=jnp.full((1, 2), np.log(0.7))
        )
        smc = AnnealedSMC.create(proposal, target, num_temps=12,
                                 num_leapfrog=5, step_size=0.3)
        particles, log_w, log_z = jax.jit(lambda k: smc.sample(k, 1024))(
            jax.random.key(2)
        )
        w = jax.nn.softmax(log_w)
        mean_est = jnp.sum(w[:, None] * particles, axis=0)
        assert_close(mean_est, jnp.full(2, 3.0), atol=0.15, rtol=0.1)
        assert abs(float(log_z)) < 0.3  # normalized target -> log Z ~ 0

    def test_rejects_truncated_ladder(self):
        """sample() initializes log_w = 0, which is exact only for the
        beta_0=0 / beta_M=1 endpoints — any other ladder silently biases
        every weight and the evidence estimate, so create() must refuse."""
        import pytest
        from normflows_tpu import distributions

        proposal = distributions.DiagGaussian.create(2)
        target = distributions.DiagGaussian.create(2)
        with pytest.raises(ValueError, match="betas"):
            AnnealedSMC.create(proposal, target, betas=[0.1, 0.5, 1.0])
        with pytest.raises(ValueError, match="betas"):
            AnnealedSMC.create(proposal, target, betas=[0.0, 0.5, 0.9])

    def test_flow_proposal(self):
        # flow (identity-init NSF) as the SMC proposal
        layers = [
            flows.CoupledRationalQuadraticSpline.create(jax.random.key(i), 2, 1, 16)
            for i in range(2)
        ]
        proposal = nft.NormalizingFlow.create(
            D.DiagGaussian.create(2), layers
        )
        target = D.TwoMoons()
        smc = AnnealedSMC.create(proposal, target, num_temps=8,
                                 num_leapfrog=5, step_size=0.2)
        particles, log_w, log_z = smc.sample(jax.random.key(3), 512)
        assert particles.shape == (512, 2)
        assert jnp.all(jnp.isfinite(log_w))
        # samples should live near the ring of radius 2
        w = jax.nn.softmax(log_w)
        r = jnp.sum(w * jnp.linalg.norm(particles, axis=1))
        assert abs(float(r) - 2.0) < 0.3


class TestNeuTraHMC:
    def test_samples_match_target_moments(self):
        # train a small flow on TwoMoons first
        import optax

        b = jnp.array([1.0, 0.0])
        layers = []
        for i in range(6):
            k1, k2 = jax.random.split(jax.random.key(i))
            s = MLP.create(k1, [2, 32, 2], init_zeros=True)
            t = MLP.create(k2, [2, 32, 2], init_zeros=True)
            layers.append(
                flows.MaskedAffineFlow.create(b if i % 2 == 0 else 1 - b, t=t, s=s)
            )
        model = nft.NormalizingFlow.create(
            D.DiagGaussian.create(2), layers, p=D.TwoMoons()
        )
        x_all = model.p.sample(jax.random.key(10), 2048)
        opt = optax.adam(5e-3)
        diff, rest = nft.partition(model)
        state = opt.init(diff)

        @jax.jit
        def step(diff, state, x):
            loss, grads = jax.value_and_grad(
                lambda d: nft.combine(d, rest).forward_kld(x)
            )(diff)
            updates, state = opt.update(grads, state, diff)
            return optax.apply_updates(diff, updates), state, loss

        for i in range(60):
            diff, state, _ = step(diff, state, x_all[(i * 256) % 2048:][:256])
        model = nft.combine(diff, rest)

        neutra = NeuTraHMC.create(model, num_leapfrog=5, init_step_size=0.3)
        samples, info = neutra.sample(jax.random.key(11), num_chains=128,
                                      num_steps=40, num_adapt=30)
        assert samples.shape == (40, 128, 2)
        xs = samples[10:].reshape(-1, 2)  # drop warmup
        # TwoMoons: radius ~2, |x0| mean ~ 1.7, symmetric in x0
        r = jnp.linalg.norm(xs, axis=1)
        assert abs(float(jnp.mean(r)) - 2.0) < 0.2
        assert abs(float(jnp.mean(xs[:, 1]))) < 0.3
