"""Augmented normalizing flow on TwoMoons x N(0,I)
(reference: examples/augmented_flow.ipynb).

The 2-D TwoMoons target is augmented with 2 independent Gaussian dims
(`TwoIndependent`), letting a 4-D Real-NVP-style flow with ActNorm layers fit
a multimodal density through the augmented space; trained by annealed
reverse KLD.

Run:  python examples/augmented_flow.py [--iters 2000]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.nets import MLP
from normflows_tpu.utils import enable_compilation_cache


def build_model(K=32, latent_size=4, key=None):
    key = key if key is not None else jax.random.key(0)
    b = jnp.array([1.0] * (latent_size // 2) + [0.0] * (latent_size // 2))
    layers = []
    for i in range(K):
        kk = jax.random.fold_in(key, i)
        s = MLP.create(kk, [latent_size, 4 * latent_size, latent_size],
                       init_zeros=True)
        t = MLP.create(jax.random.fold_in(kk, 1),
                       [latent_size, 4 * latent_size, latent_size],
                       init_zeros=True)
        layers.append(flows.MaskedAffineFlow.create(b if i % 2 == 0 else 1 - b,
                                                    t=t, s=s))
        layers.append(flows.ActNorm.create(latent_size))
    target = distributions.TwoIndependent(
        target1=distributions.TwoMoons(),
        target2=distributions.DiagGaussian.create(2, trainable=False),
    )
    q0 = distributions.DiagGaussian.create(latent_size)
    return nf.NormalizingFlow.create(q0, layers, p=target)


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--num-samples", type=int, default=1024)
    ap.add_argument("--anneal-iters", type=int, default=1000)
    args = ap.parse_args()

    model = build_model()
    # data-dependent ActNorm init from a first sampling pass
    model = model.init_actnorm_sampling(jax.random.key(8), 128)

    opt = optax.chain(optax.add_decayed_weights(1e-6), optax.adam(1e-4))
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, key, beta):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).reverse_kld(
                key, args.num_samples, beta=beta)
        )(diff)
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    key = jax.random.key(0)
    t0 = time.time()
    for i in range(args.iters):
        key, sub = jax.random.split(key)
        beta = min(1.0, 0.01 + i / args.anneal_iters)  # KL annealing
        diff, opt_state, loss = step(diff, opt_state, sub, beta)
        if i % 200 == 0 or i == args.iters - 1:
            print(f"iter {i:5d}  beta {beta:.2f}  loss {float(loss):.4f}")
    print(f"wall time {time.time() - t0:.1f}s")

    model = nf.combine(diff, rest)
    z, _ = model.sample(jax.random.key(1), 2**14)
    # standard coords should land on the moons (radius ~2 ring halves),
    # augmented coords on N(0, I)
    print("standard-coord mean radius:",
          float(jnp.sqrt((z[:, :2] ** 2).sum(-1)).mean()))
    print("augmented-coord std:", float(z[:, 2:].std()))


if __name__ == "__main__":
    main()
