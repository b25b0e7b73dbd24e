"""Serving export (serving.py): serialized StableHLO sample/log_prob.

A trained flow is frozen into jax.export artifacts, serialized to disk,
deserialized, and called — results must match the live model bit-for-bit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import normflows_tpu as nf
from normflows_tpu import flows, distributions, serving


def _realnvp(K=4, hidden=32):
    key = jax.random.key(0)
    layers = []
    for i in range(K):
        pm = nf.nets.MLP.create(jax.random.fold_in(key, i), [2, hidden, 2],
                                init_zeros=True)
        mask = jnp.array([i % 2, (i + 1) % 2], dtype=jnp.float32)
        layers.append(flows.MaskedAffineFlow.create(mask, t=pm, s=None))
    return nf.NormalizingFlow.create(
        distributions.DiagGaussian.create(2), layers,
        p=distributions.TwoMoons())


def _nsf(K=2, hidden=32):
    key = jax.random.key(3)
    base = distributions.UniformGaussian.create(
        2, [1], jnp.array([1.0, 2 * np.pi]))
    layers = [
        flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.fold_in(key, i), 2, 1, hidden, ind_circ=[1],
            num_bins=4, tail_bound=jnp.array([5.0, np.pi]),
            permute_mask=True, rng_seed=i,
        )
        for i in range(K)
    ]
    return nf.NormalizingFlow.create(base, layers)


class TestServingBundle:
    def test_roundtrip_matches_live_model(self, tmp_path):
        model = _realnvp()
        serving.save_bundle(model, str(tmp_path), num_samples=64,
                            event_shape=(2,))
        bundle = serving.load_bundle(str(tmp_path))

        z, lq = bundle.sample(7)
        z2, lq2 = model.sample_and_log_prob(jax.random.key(jnp.uint32(7)), 64)
        np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
        np.testing.assert_array_equal(np.asarray(lq), np.asarray(lq2))

    def test_symbolic_batch_serves_any_size(self, tmp_path):
        model = _realnvp()
        serving.save_bundle(model, str(tmp_path), num_samples=8,
                            event_shape=(2,))
        bundle = serving.load_bundle(str(tmp_path))
        for b in (1, 5, 33):
            x = jax.random.normal(jax.random.key(b), (b, 2))
            np.testing.assert_allclose(
                np.asarray(bundle.log_prob(x)),
                np.asarray(model.log_prob(x)), atol=1e-6)

    def test_manifest_contents(self, tmp_path):
        model = _realnvp()
        serving.save_bundle(model, str(tmp_path), num_samples=16,
                            event_shape=(2,))
        bundle = serving.load_bundle(str(tmp_path))
        assert bundle.manifest["num_samples"] == 16
        assert bundle.manifest["event_shape"] == [2]
        assert bundle.manifest["symbolic_batch"] is True

    def test_spline_model_exports(self, tmp_path):
        # the NSF path (spline kernels + MADE) must survive export too
        model = _nsf()
        serving.save_bundle(model, str(tmp_path), num_samples=16,
                            event_shape=(2,))
        bundle = serving.load_bundle(str(tmp_path))
        z, lq = bundle.sample(3)
        z2, lq2 = model.sample_and_log_prob(jax.random.key(jnp.uint32(3)), 16)
        # allclose, not bit-equal: the exported executable is compiled from
        # round-tripped StableHLO, so fusion choices may differ by ~1 ulp
        np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-5)
        x = jax.random.normal(jax.random.key(11), (9, 2))
        np.testing.assert_allclose(
            np.asarray(bundle.log_prob(x)),
            np.asarray(model.log_prob(x)), atol=1e-6)

    def test_exported_objects_direct(self):
        model = _realnvp()
        exp = serving.export_sampler(model, 8)
        z, lq = exp.call(jnp.uint32(0))
        assert z.shape == (8, 2) and lq.shape == (8,)


class TestClassCondServing:
    def test_class_cond_multiscale_bundle(self, tmp_path):
        """Class-conditional export: (seed, y) sampler + (x, y) log_prob
        with a shared symbolic batch dim (MultiscaleFlow, class-cond bases)."""
        from test_glow_multiscale import build_glow

        model = build_glow()
        x = jax.random.uniform(jax.random.key(3), (5, 3, 8, 8),
                               minval=0.01, maxval=0.99)
        y = jnp.array([0, 1, 2, 3, 0])
        p = str(tmp_path / "ccbundle")
        serving.save_bundle(model, p, num_samples=4, event_shape=(3, 8, 8),
                            class_cond=True)
        bundle = serving.load_bundle(p)
        assert bundle.manifest["class_cond"] is True

        np.testing.assert_allclose(
            np.asarray(bundle.log_prob(x, y)),
            np.asarray(model.log_prob(x, y)), rtol=1e-5, atol=1e-5)
        # any batch size through the symbolic dim
        np.testing.assert_allclose(
            np.asarray(bundle.log_prob(x[:2], y[:2])),
            np.asarray(model.log_prob(x[:2], y[:2])), rtol=1e-5, atol=1e-5)

        ys = jnp.array([0, 1, 2, 3])
        samples, log_q = bundle.sample(7, ys)
        assert samples.shape == (4, 3, 8, 8)
        z_live, lq_live = model.sample(jax.random.key(7), 4, ys)
        np.testing.assert_allclose(np.asarray(samples), np.asarray(z_live),
                                   rtol=1e-5, atol=1e-5)


def test_class_cond_bundle_y_validation(tmp_path):
    """Clear errors when y is missing on a class-cond bundle or passed to an
    unconditional one (instead of opaque asarray/shape failures)."""
    from test_glow_multiscale import build_glow

    model = build_glow()
    p = str(tmp_path / "cc")
    serving.save_bundle(model, p, num_samples=4, event_shape=(3, 8, 8),
                        class_cond=True)
    bundle = serving.load_bundle(p)
    with pytest.raises(ValueError, match="requires a label vector"):
        bundle.sample(3)
    with pytest.raises(ValueError, match="requires a label vector"):
        bundle.log_prob(jnp.zeros((2, 3, 8, 8)))

    # unconditional bundle rejects y
    K = 2
    layers = []
    b = jnp.array([1.0, 0.0])
    from normflows_tpu.nets import MLP
    for i in range(K):
        s = MLP.create(jax.random.key(2 * i), [2, 16, 2], init_zeros=True)
        layers.append(flows.MaskedAffineFlow.create(
            b if i % 2 == 0 else 1 - b, t=None, s=s))
    m2 = nf.NormalizingFlow.create(
        distributions.DiagGaussian.create(2), layers)
    p2 = str(tmp_path / "uncond")
    serving.save_bundle(m2, p2, num_samples=4, event_shape=(2,))
    b2 = serving.load_bundle(p2)
    with pytest.raises(ValueError, match="unconditional"):
        b2.log_prob(jnp.zeros((2, 2)), jnp.array([0, 1]))


def test_symbolic_batch_export_with_pallas_backend_enabled():
    """On TPU the Pallas kernel gates must route symbolic (jax.export) batch
    dims to the jnp path instead of crashing on an inconclusive shape
    comparison — regression for the --exported bench failure.  Simulated on
    CPU by forcing the pallas backend (the gates run before any kernel is
    built, so no interpret mode is needed for the symbolic trace)."""
    import tempfile

    import numpy as np
    import normflows_tpu as nf
    from normflows_tpu import flows, distributions, serving
    from normflows_tpu.ops import backend

    base = distributions.UniformGaussian.create(
        2, [1], jnp.array([1.0, 2 * np.pi]))
    layers = [
        flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.key(i), 2, 1, 32, ind_circ=[1], num_bins=6,
            tail_bound=jnp.array([5.0, np.pi]), permute_mask=True, rng_seed=i)
        for i in range(2)
    ]
    model = nf.NormalizingFlow.create(base, layers)
    backend.set_kernel_backend("pallas")
    try:
        exp = serving.export_log_prob(model, (2,), symbolic_batch=True)
    finally:
        backend.set_kernel_backend("auto")
    x = jax.random.normal(jax.random.key(1), (5, 2))
    ref = model.log_prob(x)
    np.testing.assert_allclose(np.asarray(exp.call(x)), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # concrete-batch export keeps working and matches too
    exp_c = serving.export_log_prob(model, (2,), symbolic_batch=False,
                                    batch_size=5)
    np.testing.assert_allclose(np.asarray(exp_c.call(x)), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_unconditional_multiscale_sampler_exports():
    """export_sampler must work for MultiscaleFlow, which exposes (x, log_q)
    through sample() but has no sample_and_log_prob alias (round-5 review
    regression: unconditional Glow models could not be exported)."""
    import numpy as np
    from normflows_tpu import serving
    from tests.test_glow_multiscale import build_glow

    model = build_glow(class_cond=False)
    exp = serving.export_sampler(model, 4)
    x, log_q = exp.call(np.uint32(7))
    assert x.shape[0] == 4 and bool(jnp.all(jnp.isfinite(log_q)))


def test_symbolic_batch_export_large_d_sliced_inverse():
    """The D>8 sliced sequential inverse must gate OFF for symbolic (jax.
    export) batch dims — its dyncodes Pallas kernel needs a concrete grid —
    and route to the general recursion (round-5 review regression: the gate
    lacked the isinstance(batch, int) check its sibling fast paths have).
    The recursion is hit through log_prob when the inner AR transform is
    used directly as a flow (its ``inverse`` is the D-pass recursion)."""
    import numpy as np
    import normflows_tpu as nf
    from normflows_tpu import flows, distributions, serving
    from normflows_tpu.ops import backend

    D = 12
    inner = flows.AutoregressiveRationalQuadraticSpline.create(
        jax.random.key(0), D, 1, 16, num_bins=4, permute_mask=True,
    ).mprqat
    model = nf.NormalizingFlow.create(
        distributions.DiagGaussian.create(D), [inner])
    x = jax.random.normal(jax.random.key(1), (7, D))
    ref = model.log_prob(x)
    backend.set_kernel_backend("pallas")
    try:
        exp = serving.export_log_prob(model, (D,), symbolic_batch=True)
    finally:
        backend.set_kernel_backend("auto")
    np.testing.assert_allclose(np.asarray(exp.call(x)), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
