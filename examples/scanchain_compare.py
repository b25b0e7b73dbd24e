"""Flagship train step: ScanChain (lax.scan over stacked layers) vs unrolled.

The 12-layer circular-NSF stack is homogeneous, so the per-layer Python loop
(reference core.py:98 translated to trace-time unrolling) can instead run as a
single ``lax.scan`` body over stacked parameters (core/flow.py:ScanChain).
This script measures what that buys: time-to-first-step (compile + run, with
the persistent compilation cache OFF) and steady-state step time, for both
variants, and prints one JSON row per variant.

Run on the real chip:
    env PYTHONPATH="/root/.axon_site:/root/repo" python examples/scanchain_compare.py
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.core.flow import ScanChain


def build_layers(K, hidden):
    return [
        flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.key(i), 2, 1, hidden, ind_circ=[1], num_bins=10,
            tail_bound=jnp.array([5.0, np.pi]), permute_mask=True, rng_seed=i,
        )
        for i in range(K)
    ]


def measure(model, num_samples, iters):
    model = nf.utils.set_compute_dtype(model, "bfloat16")
    opt = optax.adam(5e-4)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).reverse_kld(key, num_samples)
        )(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    key = jax.random.key(0)
    t0 = time.perf_counter()
    diff, opt_state, loss = step(diff, opt_state, key)
    jax.block_until_ready(loss)
    first_step_s = time.perf_counter() - t0

    for _ in range(3):  # extra warmup
        key, sub = jax.random.split(key)
        diff, opt_state, loss = step(diff, opt_state, sub)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        diff, opt_state, loss = step(diff, opt_state, sub)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    return first_step_s, dt, float(loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=12)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--num-samples", type=int, default=2**14)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    base = distributions.UniformGaussian.create(2, [1], jnp.array([1.0, 2 * np.pi]))
    target = distributions.GaussianVonMises()
    layers = build_layers(args.K, args.hidden)

    variants = {
        "unrolled": nf.NormalizingFlow.create(base, layers, p=target),
        "scan_chain": nf.NormalizingFlow.create(
            base, [ScanChain.create(layers)], p=target),
    }
    for name, model in variants.items():
        first, dt, loss = measure(model, args.num_samples, args.iters)
        print(json.dumps({
            "variant": name,
            "K": args.K,
            "hidden": args.hidden,
            "time_to_first_step_s": round(first, 2),
            "ms_per_iter": round(dt * 1e3, 3),
            "samples_per_sec": round(args.num_samples / dt, 1),
            "loss": round(loss, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
