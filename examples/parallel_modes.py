"""All four parallelism modes on one model, side by side.

Runs the flagship NSF architecture (reduced size) through data-parallel,
tensor-parallel, FSDP, and pipeline-parallel execution on a virtual device
mesh and checks every mode against single-device execution.  On a real pod,
replace the mesh constructors with the pod topology (docs/scaling.md).

Run:
  env -u PYTHONPATH JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=. python examples/parallel_modes.py
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions, parallel
from normflows_tpu.utils import enable_compilation_cache


def build_model(K=4, hidden=64):
    key = jax.random.key(0)
    base = distributions.UniformGaussian.create(
        2, [1], jnp.array([1.0, 2 * np.pi]))
    layers = [
        flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.fold_in(key, i), 2, 1, hidden, ind_circ=[1],
            num_bins=8, tail_bound=jnp.array([5.0, np.pi]),
            permute_mask=True, rng_seed=i,
        )
        for i in range(K)
    ]
    return nf.NormalizingFlow.create(
        base, layers, p=distributions.GaussianVonMises())


def single_device_loss(model, batch):
    return float(jax.jit(lambda m, b: m.forward_kld(b))(model, batch))


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    model = build_model()
    opt = optax.adam(1e-3)
    batch = model.p.sample(jax.random.key(1), 64)
    ref = single_device_loss(model, batch)
    print(f"single-device forward_kld: {ref:.6f}")

    def loss_fn(m, b, key):
        return m.forward_kld(b)

    # 1. data parallel: batch sharded, params replicated
    mesh = parallel.make_mesh({"data": 8})
    step, diff, rest, opt_state = parallel.make_data_parallel_step(
        model, opt, loss_fn, mesh)
    _, _, loss = step(diff, opt_state, parallel.shard_batch(batch, mesh),
                      jax.random.key(2))
    print(f"data-parallel (8-way):     {float(loss):.6f}")

    # 2. tensor parallel: hidden matmuls sharded over a model axis
    mesh = parallel.make_mesh({"data": 2, "model": 4})
    step, diff, rest, opt_state = parallel.make_tensor_parallel_step(
        model, opt, loss_fn, mesh)
    _, _, loss = step(diff, opt_state, parallel.shard_batch(batch, mesh),
                      jax.random.key(2))
    n_tp = sum(1 for x in jax.tree.leaves(diff)
               if "model" in str(x.sharding.spec))
    print(f"tensor-parallel (4-way):   {float(loss):.6f}  "
          f"[{n_tp} weight leaves sharded]")

    # 3. FSDP: large params + Adam moments sharded
    step, diff, rest, opt_state = parallel.make_fsdp_step(
        model, opt, loss_fn, mesh, axis="model", min_size=64 * 64)
    _, _, loss = step(diff, opt_state, parallel.shard_batch(batch, mesh),
                      jax.random.key(2))
    print(f"fsdp (model-axis):         {float(loss):.6f}")

    # 4. pipeline parallel: layer stages streamed with microbatches
    mesh = parallel.make_mesh({"stage": 4}, devices=jax.devices()[:4])
    pipe = parallel.make_pipeline_apply(
        model.flows, mesh, num_microbatches=8, reverse=True)
    z, log_det = jax.jit(pipe)(batch)
    # forward_kld = -mean(log q0(z) + sum log|det|)
    lq = model.q0.log_prob(z)
    print(f"pipeline (4-stage):        {float(-jnp.mean(lq + log_det)):.6f}")

    # 5. pipelined TRAINING: grads + optimizer through the schedule,
    #    layer params stage-sharded (each device trains only its stages)
    step, pdiff, prest, popt = parallel.make_pipeline_train_step(
        model, opt, mesh, num_microbatches=8)
    _, _, loss = step(pdiff, popt, batch, jax.random.key(2))
    print(f"pipeline train (4-stage):  {float(loss):.6f}")


if __name__ == "__main__":
    main()
