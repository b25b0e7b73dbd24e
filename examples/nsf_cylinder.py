"""Circular neural spline flow on the cylinder (Gaussian-von Mises) target —
the reference paper example and headline reverse-KL benchmark
(reference: examples/paper_example_nsf.ipynb; BASELINE.md row 2).

Run:  python examples/nsf_cylinder.py [--iters 10000]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.utils import enable_compilation_cache


def build_model(K=12, hidden=512, num_bins=10):
    base = distributions.UniformGaussian.create(2, [1], jnp.array([1.0, 2 * np.pi]))
    layers = [
        flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.key(i), 2, 1, hidden, ind_circ=[1], num_bins=num_bins,
            tail_bound=jnp.array([5.0, np.pi]), permute_mask=True, rng_seed=i,
        )
        for i in range(K)
    ]
    return nf.NormalizingFlow.create(
        base, layers, p=distributions.GaussianVonMises()
    )


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--num-samples", type=int, default=2**14)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--bf16", action="store_true",
                    help="run MADE matmuls in bfloat16 on the MXU")
    ap.add_argument("--chunk", type=int, default=1,
                    help=">1: run this many steps per dispatch under one "
                         "lax.scan (amortizes dispatch/tunnel latency; "
                         "bench.py methodology)")
    args = ap.parse_args()

    model = build_model()
    if args.bf16:
        model = nf.utils.set_compute_dtype(model, "bfloat16")
    schedule = optax.cosine_decay_schedule(args.lr, args.iters)
    opt = optax.adam(schedule)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).reverse_kld(key, args.num_samples)
        )(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    @jax.jit
    def chunk(diff, opt_state, key):
        def body(carry, _):
            diff, opt_state, key = carry
            key, sub = jax.random.split(key)
            diff, opt_state, loss = step(diff, opt_state, sub)
            return (diff, opt_state, key), loss

        (diff, opt_state, key), losses = jax.lax.scan(
            body, (diff, opt_state, key), None, length=args.chunk)
        return diff, opt_state, key, losses[-1]

    key = jax.random.key(0)
    t0 = time.time()
    if args.chunk > 1:
        assert args.iters % args.chunk == 0, "--iters must divide by --chunk"
        for c in range(args.iters // args.chunk):
            diff, opt_state, key, loss = chunk(diff, opt_state, key)
            i = (c + 1) * args.chunk - 1
            if (i + 1) % 500 < args.chunk or i == args.iters - 1:
                print(f"iter {i:5d}  reverse KLD {float(loss):.5f}")
    else:
        for i in range(args.iters):
            key, sub = jax.random.split(key)
            diff, opt_state, loss = step(diff, opt_state, sub)
            if i % 500 == 0 or i == args.iters - 1:
                print(f"iter {i:5d}  reverse KLD {float(loss):.5f}")
    print(f"training wall time: {time.time() - t0:.1f}s "
          f"({args.iters * args.num_samples / (time.time() - t0):.0f} samples/s)")

    model = nf.combine(diff, rest)
    z, log_q = model.sample(jax.random.key(1), 2**16)
    kl = float(jnp.mean(log_q - model.p.log_prob(z)))
    print(f"final KL(q||p) estimate: {kl:.5f}")


if __name__ == "__main__":
    main()
