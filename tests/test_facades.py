"""Facade-level tests mirroring the reference core_test.py (loss scalar-ness,
conditional context threading, class-conditional flows, sample/log_prob
consistency)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import normflows_tpu as nft
from normflows_tpu import flows, distributions as D
from normflows_tpu.nets import MLP
from tests.helpers import assert_close

KEY = jax.random.key(0)


def build_conditional_model(latent=2, context=3, K=4):
    """Conditional flow: context threads q0 and every layer (core_test.py:63-115)."""
    enc = MLP.create(KEY, [context, 16, 2 * latent])
    q0 = D.ConditionalDiagGaussian.create((latent,), enc)
    layers = [
        flows.CoupledRationalQuadraticSpline.create(
            jax.random.key(i), latent, 1, 32, num_context_channels=context,
            reverse_mask=bool(i % 2),
        )
        for i in range(K)
    ]
    target = D.ConditionalDiagGaussianTarget()
    return nft.ConditionalNormalizingFlow.create(q0, layers, p=target)


class TestConditionalNormalizingFlow:
    def test_sample_log_prob_consistency(self):
        model = build_conditional_model()
        ctx = jax.random.normal(jax.random.key(1), (8, 3))
        z, log_q = model.sample(jax.random.key(2), 8, context=ctx)
        assert z.shape == (8, 2)
        assert_close(model.log_prob(z, ctx), log_q, atol=1e-3, rtol=1e-3)

    def test_forward_kld_scalar(self):
        model = build_conditional_model()
        ctx = jax.random.normal(jax.random.key(3), (8, 3))
        x = jax.random.normal(jax.random.key(4), (8, 2))
        loss = model.forward_kld(x, ctx)
        assert loss.shape == ()
        assert jnp.isfinite(loss)

    def test_reverse_kld_with_conditional_target(self):
        model = build_conditional_model()
        # context = concat(mean, std) for the conditional Gaussian target
        ctx = jnp.concatenate(
            [jax.random.normal(jax.random.key(5), (16, 2)),
             jnp.ones((16, 2))], axis=1
        )
        # context dim for flows is 4 here; rebuild with matching context
        model = build_conditional_model(context=4)
        loss = model.reverse_kld(jax.random.key(6), 16, context=ctx)
        assert loss.shape == ()
        assert jnp.isfinite(loss)

    def test_context_changes_density(self):
        model = build_conditional_model()
        x = jax.random.normal(jax.random.key(7), (4, 2))
        c1 = jnp.zeros((4, 3))
        c2 = jnp.ones((4, 3))
        lp1 = model.log_prob(x, c1)
        lp2 = model.log_prob(x, c2)
        assert float(jnp.max(jnp.abs(lp1 - lp2))) > 1e-4


class TestClassCondFlow:
    def _build(self):
        q0 = D.ClassCondDiagGaussian.create((4,), 3)
        layers = []
        b = jnp.array([1.0, 0.0, 1.0, 0.0])
        for i in range(4):
            k1, k2 = jax.random.split(jax.random.key(i))
            s = MLP.create(k1, [4, 16, 4], init_zeros=True)
            t = MLP.create(k2, [4, 16, 4], init_zeros=True)
            layers.append(
                flows.MaskedAffineFlow.create(b if i % 2 == 0 else 1 - b, t=t, s=s)
            )
        return nft.ClassCondFlow.create(q0, layers)

    def test_forward_kld(self):
        model = self._build()
        x = jax.random.normal(KEY, (6, 4))
        y = jnp.array([0, 1, 2, 0, 1, 2])
        loss = model.forward_kld(x, y)
        assert loss.shape == () and jnp.isfinite(loss)

    def test_sample_log_prob_consistency(self):
        model = self._build()
        y = jnp.array([0, 1, 2, 0])
        z, log_q = model.sample(jax.random.key(1), 4, y)
        assert_close(model.log_prob(z, y), log_q, atol=1e-4, rtol=1e-4)

    def test_save_load(self, tmp_path):
        model = self._build()
        p = str(tmp_path / "ccf.pkl")
        model.save(p)
        m2 = nft.ClassCondFlow.load(p)  # core.py:446-452
        x = jax.random.normal(KEY, (3, 4))
        y = jnp.array([0, 1, 2])
        assert_close(model.log_prob(x, y), m2.log_prob(x, y))


class TestLossVariants:
    def _model(self):
        b = jnp.array([1.0, 0.0])
        layers = []
        for i in range(4):
            k1, k2 = jax.random.split(jax.random.key(i))
            s = MLP.create(k1, [2, 16, 2])
            t = MLP.create(k2, [2, 16, 2])
            layers.append(
                flows.MaskedAffineFlow.create(b if i % 2 == 0 else 1 - b, t=t, s=s)
            )
        return nft.NormalizingFlow.create(
            D.DiagGaussian.create(2), layers, p=D.TwoMoons()
        )

    def test_reverse_kld_beta_annealing(self):
        model = self._model()
        l1 = model.reverse_kld(jax.random.key(0), 256, beta=0.1)
        l2 = model.reverse_kld(jax.random.key(0), 256, beta=1.0)
        assert jnp.isfinite(l1) and jnp.isfinite(l2)
        assert float(l1) != float(l2)

    def test_sticking_the_landing_gradients_differ(self):
        model = self._model()
        diff, rest = nft.partition(model)

        def loss(d, score_fn):
            return nft.combine(d, rest).reverse_kld(
                jax.random.key(1), 256, score_fn=score_fn
            )

        g1 = jax.grad(lambda d: loss(d, True))(diff)
        g2 = jax.grad(lambda d: loss(d, False))(diff)
        # values agree, gradients differ (path-gradient estimator)
        assert_close(loss(diff, True), loss(diff, False), atol=1e-4)
        diffs = [
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2))
        ]
        assert max(diffs) > 1e-6

    def test_alpha_div_variants(self):
        model = self._model()
        for alpha in [0.5, 2.0]:
            for dreg in [False, True]:
                loss = model.reverse_alpha_div(
                    jax.random.key(2), 128, alpha=alpha, dreg=dreg
                )
                assert jnp.isfinite(loss)

    def test_forward_and_log_det_consistency(self):
        model = self._model()
        z = jax.random.normal(jax.random.key(3), (8, 2))
        x, ld = model.forward_and_log_det(z)
        x2 = model.forward(z)
        assert_close(x, x2)


class TestActNormSamplingInit:
    def test_init_actnorm_sampling_whitens(self):
        """Sampling-direction ActNorm init (reference augmented_flow.ipynb
        'Initialize ActNorm' cell: init fires on the first sample pass)."""
        layers = []
        for i in range(2):
            s = MLP.create(jax.random.key(10 + i), [2, 16, 2], init_zeros=True)
            t = MLP.create(jax.random.key(20 + i), [2, 16, 2], init_zeros=True)
            b = jnp.array([1.0, 0.0]) if i % 2 == 0 else jnp.array([0.0, 1.0])
            layers.append(flows.MaskedAffineFlow.create(b, t=t, s=s))
            layers.append(flows.ActNorm.create(2))
        q0 = D.DiagGaussian.create(2, trainable=False)
        model = nft.NormalizingFlow.create(q0, layers, p=D.TwoMoons())
        assert not bool(model.flows[1].initialized)

        model = model.init_actnorm_sampling(jax.random.key(0), 4096)
        for f in model.flows:
            if isinstance(f, flows.ActNorm):
                assert bool(f.initialized)
        # post-init forward pass of the last ActNorm produces whitened output
        z, _ = q0.sample_and_log_prob(jax.random.key(0), 4096)
        for f in model.flows:
            z, _ = f.forward(z)
        assert abs(float(z.mean())) < 0.1
        assert abs(float(z.std()) - 1.0) < 0.1

    def test_losses_finite_after_init(self):
        layers = [flows.ActNorm.create(2)]
        model = nft.NormalizingFlow.create(
            D.DiagGaussian.create(2), layers, p=D.TwoMoons()
        )
        model = model.init_actnorm_sampling(jax.random.key(1), 256)
        loss = model.reverse_kld(jax.random.key(2), 128)
        assert bool(jnp.isfinite(loss))


def test_facade_load_rejects_wrong_class(tmp_path):
    """Facade.load must not silently return a different pickled facade type."""
    import pytest
    import normflows_tpu as nf
    from normflows_tpu import flows, distributions

    model = nf.NormalizingFlow.create(
        distributions.DiagGaussian.create(2),
        [flows.Planar.create((2,))],
    )
    path = str(tmp_path / "nf.pkl")
    model.save(path)
    assert isinstance(nf.NormalizingFlow.load(path), nf.NormalizingFlow)
    with pytest.raises(TypeError, match="NormalizingFlow"):
        nf.MultiscaleFlow.load(path)


def test_load_params_like_rejects_structure_mismatch(tmp_path):
    """load_params_like must compare treedefs, not leaf counts: two models
    with equal leaf counts but different structures must NOT load silently
    (mirrors reference load_state_dict key checking, core.py:211-213)."""
    import pytest
    import normflows_tpu as nf
    from normflows_tpu import flows, distributions
    from normflows_tpu.core.facades import load_params_like

    base = distributions.DiagGaussian.create(2)
    # Planar and Radial coincide at 4 leaves for d=2:
    # Planar(u,w,b,_) vs Radial(z_0,log_alpha,beta) + base(loc,log_scale)...
    planar = nf.NormalizingFlow.create(base, [flows.Planar.create((2,))])
    radial = nf.NormalizingFlow.create(base, [flows.Radial.create((2,))])
    path = str(tmp_path / "planar.pkl")
    planar.save(path)

    # Round-trip into the matching structure works.
    restored = load_params_like(planar, path)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(planar)):
        assert_close(a, b)

    # A different architecture must raise with the mismatching path named.
    with pytest.raises(ValueError, match="does not match model structure"):
        load_params_like(radial, path)


def test_load_params_like_rejects_shape_mismatch(tmp_path):
    """Same class with different widths shares a treedef (widths are not
    static fields) — the per-leaf shape check must refuse to load, naming
    the offending leaf, instead of silently loading garbage (torch
    load_state_dict errors on size mismatch too)."""
    import pytest
    import normflows_tpu as nf
    from normflows_tpu import flows, distributions
    from normflows_tpu.nets import MLP
    from normflows_tpu.core.facades import load_params_like

    def make(width):
        s = MLP.create(jax.random.key(1), [2, width, 2], init_zeros=True)
        t = MLP.create(jax.random.key(2), [2, width, 2], init_zeros=True)
        layer = flows.MaskedAffineFlow.create(jnp.array([1.0, 0.0]), t=t, s=s)
        return nf.NormalizingFlow.create(
            distributions.DiagGaussian.create(2), [layer])

    wide, narrow = make(64), make(16)
    path = str(tmp_path / "wide.pkl")
    wide.save(path)
    assert (jax.tree.flatten(wide)[1] == jax.tree.flatten(narrow)[1])
    with pytest.raises(ValueError, match="shape"):
        load_params_like(narrow, path)


def test_gaussian_mixture_trainable_flag():
    """GaussianMixture.create(trainable=False) must exclude loc/scale/weights
    from the differentiable partition (reference registers them as fixed
    buffers, base.py:593-608)."""
    import normflows_tpu as nf
    from normflows_tpu import distributions as D

    frozen = D.GaussianMixture.create(3, 2, trainable=False, key=KEY)
    live = D.GaussianMixture.create(3, 2, trainable=True, key=KEY)
    diff_f, _ = nf.partition(frozen)
    diff_l, _ = nf.partition(live)
    assert len([l for l in jax.tree.leaves(diff_f) if l is not None]) == 0
    assert len([l for l in jax.tree.leaves(diff_l) if l is not None]) == 3

    d_frozen = D.DiagGaussian.create(2, trainable=False)
    diff_d, _ = nf.partition(d_frozen)
    assert len([l for l in jax.tree.leaves(diff_d) if l is not None]) == 0


def test_trainable_convention_scoped_to_bool():
    """The magic ``trainable`` field only engages the freeze convention when
    it is the literal bool False — a user Module with an unrelated
    (array-valued) field of that name must neither crash partition nor
    silently freeze (round-5 review hardening)."""
    import normflows_tpu as nf
    from normflows_tpu.core.module import Module

    class WithArrayField(Module):
        w: jnp.ndarray
        trainable: jnp.ndarray  # per-leaf flags, NOT the freeze convention

    m = WithArrayField(w=jnp.ones(3), trainable=jnp.array([1.0, 0.0]))
    diff, _ = nf.partition(m)
    live = [l for l in jax.tree.leaves(diff) if l is not None]
    assert len(live) == 2  # both arrays stay trainable leaves

    # numpy bools must engage the convention like python bools (config
    # pipelines produce np.False_; an identity `is False` check would
    # silently train parameters the user froze)
    import numpy as onp
    frozen_np = D.DiagGaussian.create(2, trainable=onp.False_)
    diff_np, _ = nf.partition(frozen_np)
    assert len([l for l in jax.tree.leaves(diff_np) if l is not None]) == 0


def test_load_params_like_converts_dtype(tmp_path):
    """Dtype differences convert on load (torch copy_ semantics) — only
    SHAPE mismatches are errors; a float64-saved checkpoint loads into a
    float32 model."""
    import pickle
    import normflows_tpu as nf
    from normflows_tpu import flows, distributions
    from normflows_tpu.core.facades import load_params_like

    model = nf.NormalizingFlow.create(
        distributions.DiagGaussian.create(2), [flows.Planar.create((2,))])
    path = str(tmp_path / "m.pkl")
    model.save(path)
    with open(path, "rb") as f:
        data = pickle.load(f)
    data["leaves"] = [np.asarray(l, np.float64) for l in data["leaves"]]
    with open(path, "wb") as f:
        pickle.dump(data, f)
    restored = load_params_like(model, path)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(model)):
        assert a.dtype == b.dtype
        assert_close(a, b)

    # conversion toward a NON-default model dtype (the x64-off squash above
    # cannot see this): an f32-saved checkpoint into a bf16 model must come
    # back bf16, not silently widen (round-5 review)
    bf16_model = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model)
    bf16_path = str(tmp_path / "m32.pkl")
    model.save(bf16_path)  # f32 leaves on disk
    restored16 = load_params_like(bf16_model, bf16_path)
    for a, b in zip(jax.tree.leaves(restored16), jax.tree.leaves(bf16_model)):
        assert a.dtype == b.dtype == jnp.bfloat16
