"""End-to-end Real NVP on TwoMoons — the reference's README example
(README.md:88-135, examples/real_nvp_colab.ipynb) as a training smoke test."""

import jax
import jax.numpy as jnp
import optax
import pytest

import normflows_tpu as nft
from normflows_tpu import flows, distributions
from normflows_tpu.nets import MLP
from tests.helpers import assert_close


def build_realnvp(K=8, latent=2, hidden=32, key=None):
    key = key if key is not None else jax.random.key(0)
    keys = jax.random.split(key, 2 * K)
    layer_list = []
    b = jnp.array([float(i % 2) for i in range(latent)])
    for i in range(K):
        s = MLP.create(keys[2 * i], [latent, hidden, hidden, latent], init_zeros=True)
        t = MLP.create(keys[2 * i + 1], [latent, hidden, hidden, latent], init_zeros=True)
        if i % 2 == 0:
            layer_list.append(flows.MaskedAffineFlow.create(b, t=t, s=s))
        else:
            layer_list.append(flows.MaskedAffineFlow.create(1 - b, t=t, s=s))
    q0 = distributions.DiagGaussian.create(latent)
    return nft.NormalizingFlow.create(q0, layer_list, p=distributions.TwoMoons())


class TestRealNVPEndToEnd:
    def test_sample_log_prob_consistency(self):
        model = build_realnvp(K=4)
        z, log_q = model.sample(jax.random.key(1), 32)
        log_q2 = model.log_prob(z)
        assert_close(log_q, log_q2, atol=1e-4, rtol=1e-4)

    def test_forward_inverse_identity(self):
        model = build_realnvp(K=4)
        z = jax.random.normal(jax.random.key(2), (16, 2))
        x, ld_f = model.forward_and_log_det(z)
        z2, ld_i = model.inverse_and_log_det(x)
        assert_close(z, z2, atol=1e-4)
        assert_close(ld_f + ld_i, jnp.zeros(16), atol=1e-4)

    def test_forward_kld_training_reduces_loss(self):
        model = build_realnvp(K=8)
        target = distributions.TwoMoons()
        x_all = target.sample(jax.random.key(3), 4096)

        optimizer = optax.adam(5e-3)
        diff, rest = nft.partition(model)
        opt_state = optimizer.init(diff)

        @jax.jit
        def step(diff, rest, opt_state, x):
            def loss_fn(diff):
                m = nft.combine(diff, rest)
                return m.forward_kld(x)

            loss, grads = jax.value_and_grad(loss_fn)(diff)
            updates, opt_state = optimizer.update(grads, opt_state, diff)
            diff = optax.apply_updates(diff, updates)
            return diff, opt_state, loss

        losses = []
        for i in range(60):
            x = x_all[(i * 256) % 4096 : (i * 256) % 4096 + 256]
            diff, opt_state, loss = step(diff, rest, opt_state, x)
            losses.append(float(loss))
        assert losses[-1] < losses[0] - 0.3, f"no training progress: {losses[0]} -> {losses[-1]}"
        assert all(jnp.isfinite(jnp.asarray(losses)))

    def test_reverse_kld_runs(self):
        model = build_realnvp(K=4)
        for score_fn in [True, False]:
            loss = model.reverse_kld(jax.random.key(4), 128, score_fn=score_fn)
            assert jnp.isfinite(loss)

    def test_reverse_alpha_div_runs(self):
        model = build_realnvp(K=4)
        for dreg in [True, False]:
            loss = model.reverse_alpha_div(jax.random.key(5), 64, alpha=0.5, dreg=dreg)
            assert jnp.isfinite(loss)

    def test_save_load_roundtrip(self, tmp_path):
        model = build_realnvp(K=2)
        p = str(tmp_path / "model.pkl")
        model.save(p)
        model2 = nft.load_model(p)
        z = jax.random.normal(jax.random.key(6), (4, 2))
        assert_close(model.log_prob(z), model2.log_prob(z))
