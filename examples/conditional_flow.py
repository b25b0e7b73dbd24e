"""Conditional neural spline flow on a context-dependent Gaussian target
(reference: examples/conditional_flow.ipynb).

A `ConditionalNormalizingFlow` with context-conditioned autoregressive
RQ-spline layers learns p(x | context) where context = concat(mean, std) of
the target Gaussian; trained by forward KLD on target samples.

Run:  python examples/conditional_flow.py [--iters 5000]
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


def build_model(K=4, hidden=128, context_size=4, key=None):
    key = key if key is not None else jax.random.key(0)
    layers = []
    for i in range(K):
        layers.append(flows.AutoregressiveRationalQuadraticSpline.create(
            jax.random.fold_in(key, 2 * i), 2, 2, hidden,
            num_context_channels=context_size,
        ))
        layers.append(flows.LULinearPermute.create(2, seed=i))
    q0 = distributions.DiagGaussian.create(2, trainable=False)
    target = distributions.ConditionalDiagGaussianTarget()
    return nf.ConditionalNormalizingFlow.create(q0, layers, p=target)


def sample_context(key, batch):
    """context = concat(mean ~ N(0,I), std ~ U(0.5, 1))  (notebook train cell)."""
    km, ks = jax.random.split(key)
    mean = jax.random.normal(km, (batch, 2))
    std = 0.5 + 0.5 * jax.random.uniform(ks, (batch, 2))
    return jnp.concatenate([mean, std], axis=-1)


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=3e-4)
    args = ap.parse_args()

    model = build_model()
    opt = optax.chain(optax.add_decayed_weights(1e-5), optax.adam(args.lr))
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, key):
        kc, kx = jax.random.split(key)
        context = sample_context(kc, args.batch)
        m = nf.combine(diff, rest)
        x = m.p.sample(kx, args.batch, context)
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x, context)
        )(diff)
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    key = jax.random.key(0)
    t0 = time.time()
    for i in range(args.iters):
        key, sub = jax.random.split(key)
        diff, opt_state, loss = step(diff, opt_state, sub)
        if i % 500 == 0 or i == args.iters - 1:
            print(f"iter {i:5d}  forward KLD {float(loss):.4f}")
    print(f"wall time {time.time() - t0:.1f}s")

    # conditional samples should track the requested mean/std
    model = nf.combine(diff, rest)
    ctx = jnp.tile(jnp.array([[0.3, 0.9, 0.6, 0.6]]), (4096, 1))
    z, _ = model.sample(jax.random.key(1), 4096, context=ctx)
    print("sample mean:", np.round(jnp.mean(z, 0), 3),
          "(target [0.3, 0.9])")
    print("sample std: ", np.round(jnp.std(z, 0), 3), "(target [0.6, 0.6])")


if __name__ == "__main__":
    main()
