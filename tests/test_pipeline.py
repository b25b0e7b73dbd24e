"""Pipeline parallelism over flow layers (parallel/pipeline.py).

GPipe-style microbatching over a ``stage`` mesh axis; each test checks the
pipelined result (and its gradients) against the plain sequential layer
loop on the 8-virtual-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import normflows_tpu as nf
from normflows_tpu import flows, parallel
from normflows_tpu.parallel.pipeline import make_pipeline_apply


def _layers(K=8, hidden=32):
    key = jax.random.key(0)
    return [
        flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.fold_in(key, i), 2, 1, hidden, ind_circ=[1],
            num_bins=4, tail_bound=jnp.array([5.0, np.pi]),
            permute_mask=True, rng_seed=0,
        )
        for i in range(K)
    ]


def _sequential(layers, z, reverse=False):
    ld = jnp.zeros(z.shape[0])
    seq = reversed(layers) if reverse else layers
    for l in seq:
        z, dl = (l.inverse if reverse else l.forward)(z)
        ld = ld + dl
    return z, ld


@pytest.fixture(scope="module")
def mesh():
    return parallel.make_mesh({"stage": 4}, devices=jax.devices()[:4])


class TestPipeline:
    def test_forward_matches_sequential(self, mesh):
        layers = _layers()
        z = jax.random.normal(jax.random.key(1), (32, 2))
        zs, lds = _sequential(layers, z)
        pipe = make_pipeline_apply(layers, mesh, num_microbatches=8)
        zp, ldp = jax.jit(pipe)(z)
        np.testing.assert_allclose(zs, zp, atol=1e-5)
        np.testing.assert_allclose(lds, ldp, atol=1e-4)

    def test_inverse_matches_sequential(self, mesh):
        layers = _layers()
        z = jax.random.normal(jax.random.key(2), (32, 2))
        zs, lds = _sequential(layers, z, reverse=True)
        pipe = make_pipeline_apply(layers, mesh, num_microbatches=8,
                                   reverse=True)
        zp, ldp = jax.jit(pipe)(z)
        np.testing.assert_allclose(zs, zp, atol=1e-5)
        np.testing.assert_allclose(lds, ldp, atol=1e-4)

    def test_default_microbatch_count(self, mesh):
        layers = _layers()
        z = jax.random.normal(jax.random.key(3), (32, 2))  # 32 % (2*4) == 0
        zp, ldp = jax.jit(make_pipeline_apply(layers, mesh))(z)
        zs, lds = _sequential(layers, z)
        np.testing.assert_allclose(zs, zp, atol=1e-5)

    def test_gradients_match_sequential(self, mesh):
        layers = _layers()
        z = jax.random.normal(jax.random.key(4), (32, 2))
        ldiff, lrest = nf.partition(tuple(layers))

        def loss_pipe(d):
            pipe = make_pipeline_apply(
                list(nf.combine(d, lrest)), mesh, num_microbatches=8)
            zo, ld = pipe(z)
            return jnp.sum(zo ** 2) + jnp.sum(ld)

        def loss_seq(d):
            zo, ld = _sequential(list(nf.combine(d, lrest)), z)
            return jnp.sum(zo ** 2) + jnp.sum(ld)

        gp = jax.grad(loss_pipe)(ldiff)
        gs = jax.grad(loss_seq)(ldiff)
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
            np.testing.assert_allclose(a, b, atol=1e-4)

    def test_indivisible_depth_raises(self, mesh):
        with pytest.raises(ValueError, match="divisible"):
            make_pipeline_apply(_layers(K=6), mesh)

    def test_indivisible_batch_raises(self, mesh):
        pipe = make_pipeline_apply(_layers(), mesh, num_microbatches=8)
        z = jax.random.normal(jax.random.key(5), (30, 2))
        with pytest.raises(ValueError, match="microbatches"):
            pipe(z)

    def test_heterogeneous_layers_raise(self, mesh):
        layers = _layers(K=4)
        layers[2] = flows.Planar.create(2, key=jax.random.key(9))
        with pytest.raises(ValueError, match="homogeneous"):
            make_pipeline_apply(layers, mesh)
