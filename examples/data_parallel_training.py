"""Data-parallel training across all local devices (new TPU-native
functionality; the reference is single-device only, SURVEY.md §2.7).

Shards the batch over a device mesh; XLA inserts the gradient allreduce over
ICI.  Works on a multi-chip TPU slice or on CPU with
``XLA_FLAGS=--xla_force_host_platform_device_count=8``.

Run:  python examples/data_parallel_training.py [--iters 1000]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions, parallel
from normflows_tpu.nets import MLP
from normflows_tpu.utils import enable_compilation_cache


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--global-batch", type=int, default=4096)
    args = ap.parse_args()

    # multi-host: no-op on a single process
    parallel.initialize_distributed()
    mesh = parallel.make_mesh()
    print(f"devices: {jax.device_count()}  mesh: "
          f"{dict(zip(mesh.axis_names, mesh.devices.shape))}")

    b = jnp.array([1.0, 0.0])
    layers = []
    for i in range(args.k):
        k1, k2 = jax.random.split(jax.random.key(i))
        s = MLP.create(k1, [2, 64, 64, 2], init_zeros=True)
        t = MLP.create(k2, [2, 64, 64, 2], init_zeros=True)
        layers.append(
            flows.MaskedAffineFlow.create(b if i % 2 == 0 else 1 - b, t=t, s=s)
        )
    model = nf.NormalizingFlow.create(
        distributions.DiagGaussian.create(2), layers, p=distributions.TwoMoons()
    )

    step_fn, diff, rest, opt_state = parallel.make_data_parallel_step(
        model, optax.adam(5e-4), lambda m, x, key: m.forward_kld(x), mesh
    )

    x_all = distributions.TwoMoons().sample(jax.random.key(1), 2**16)
    t0 = time.time()
    n = x_all.shape[0]
    for i in range(args.iters):
        s = (i * args.global_batch) % (n - args.global_batch)
        x = parallel.shard_batch(x_all[s : s + args.global_batch], mesh)
        diff, opt_state, loss = step_fn(diff, opt_state, x, jax.random.key(i))
        if i % 200 == 0 or i == args.iters - 1:
            print(f"iter {i:5d}  loss {float(loss):.4f}")
    dt = time.time() - t0
    print(f"throughput: {args.iters * args.global_batch / dt:.0f} samples/s "
          f"across {jax.device_count()} device(s)")


if __name__ == "__main__":
    main()
