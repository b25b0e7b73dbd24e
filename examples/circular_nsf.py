"""Circular neural spline flow on a 2-D target with one circular coordinate
(reference: examples/circular_nsf.ipynb — distinct from the cylinder *paper*
example, which is reverse-KLD on a Gaussian–von-Mises target).

Mirrors the notebook's setup: a bimodal R x S^1 target sampled directly,
UniformGaussian(2, [1], scale=[1, 2*pi]) base, K=20
CircularAutoregressiveRationalQuadraticSpline(2, 1, 128, [1],
tail_bound=[5, pi], permute_mask=True) layers, forward-KLD training with
Adam(1e-4, wd 1e-4).  Batches are sampled from the target INSIDE the jitted
step — no host->device transfer per iteration.

Run:  python examples/circular_nsf.py [--iters 20000]
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


def sample_target(key, n):
    """The notebook's Target.sample (circular_nsf.ipynb cell 2): dim 0 is a
    two-component Gaussian mixture on R, dim 1 an arccos-shaped bimodal
    density wrapped onto [-pi, pi)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = jax.random.normal(k1, (n, 2))
    c = jax.random.uniform(k2, (n, 2)) > 0.6
    s = jnp.where(c, 0.3 * s - 0.5, s + 1.3)
    u = jax.random.uniform(k3, (n, 1))
    s_ = jnp.arccos(2 * u - 1)
    neg = jax.random.uniform(k4, (n, 1)) > 0.3
    s_ = jnp.where(neg, -s_, s_)
    circ = (s_ + 1) % (2 * np.pi) - np.pi
    return jnp.concatenate([s[:, :1], circ], axis=1)


def build_model(key, k_layers=20, hidden=128):
    base = distributions.UniformGaussian.create(
        2, [1], scale=jnp.array([1.0, 2 * np.pi]))
    layers = [
        flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.fold_in(key, i), 2, 1, hidden, [1],
            tail_bound=jnp.array([5.0, np.pi]), permute_mask=True,
        )
        for i in range(k_layers)
    ]
    return nf.NormalizingFlow.create(base, layers)


def main(argv=None):
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2**10)
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args(argv)

    model = build_model(jax.random.key(0), args.k, args.hidden)
    opt = optax.adamw(args.lr, weight_decay=1e-4)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, key):
        x = sample_target(key, args.batch)

        def loss_fn(d):
            return nf.combine(d, rest).forward_kld(x)

        loss, grads = jax.value_and_grad(loss_fn)(diff)
        # NaN/Inf loss skip, as in the notebook's train cell
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    key = jax.random.key(1)
    t0 = time.time()
    for i in range(args.iters):
        key, sub = jax.random.split(key)
        diff, opt_state, loss = step(diff, opt_state, sub)
        if i % max(1, args.iters // 10) == 0 or i == args.iters - 1:
            print(f"iter {i:6d}  forward_kld {float(loss):8.4f}")
    print(f"trained {args.iters} iters in {time.time() - t0:.1f}s")

    model = nf.combine(diff, rest)
    s, _ = model.sample(jax.random.key(2), 50000)
    s = np.asarray(s)
    # held-out NLL + circular-coordinate sanity: samples must stay in range
    x_test = sample_target(jax.random.key(3), 2**13)
    nll = float(model.forward_kld(x_test))
    in_range = float(np.mean(np.abs(s[:, 1]) <= np.pi + 1e-4))
    print(f"held-out forward_kld {nll:.4f}")
    print(f"circular-coord samples within [-pi, pi]: {100 * in_range:.2f}%")
    return nll


if __name__ == "__main__":
    main()
