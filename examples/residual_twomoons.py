"""Residual flow on two moons (reference: examples/residual.ipynb:
K=16 residual blocks + ActNorm, LipschitzMLP [2,128,128,2] L=0.9,
update_lipschitz after every step).

Run:  python examples/residual_twomoons.py [--iters 20000]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.nets import LipschitzMLP
from normflows_tpu.utils import update_lipschitz


def make_moons(key, n, noise=0.1):
    """sklearn.datasets.make_moons equivalent."""
    k1, k2, k3 = jax.random.split(key, 3)
    n_out = n // 2
    n_in = n - n_out
    t_out = jnp.linspace(0, np.pi, n_out)
    t_in = jnp.linspace(0, np.pi, n_in)
    outer = jnp.stack([jnp.cos(t_out), jnp.sin(t_out)], axis=1)
    inner = jnp.stack([1 - jnp.cos(t_in), 1 - jnp.sin(t_in) - 0.5], axis=1)
    x = jnp.concatenate([outer, inner])
    x = x + noise * jax.random.normal(k1, x.shape)
    return jax.random.permutation(k2, x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--lr", type=float, default=3e-4)
    args = ap.parse_args()

    layers = []
    for i in range(args.k):
        net = LipschitzMLP.create(
            jax.random.key(i), [2, 128, 128, 2], lipschitz_const=0.9,
            init_zeros=True,
        )
        layers.append(flows.Residual.create(net, reduce_memory=True))
        layers.append(flows.ActNorm.create((2,)))
    model = nf.NormalizingFlow.create(
        distributions.DiagGaussian.create(2), layers,
        p=distributions.TwoMoons(),
    )

    x_all = make_moons(jax.random.key(100), 2**14)
    model = model.init_actnorm(x_all[: args.batch])

    opt = optax.adamw(args.lr, weight_decay=1e-5)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, rest, opt_state, x, key):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x, key=key)
        )(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        diff = optax.apply_updates(diff, updates)
        # Lipschitz maintenance after the step (utils/optim.py:28-31 pattern)
        m = update_lipschitz(nf.combine(diff, rest), 50)
        diff, rest = nf.partition(m)
        return diff, rest, opt_state, loss

    key = jax.random.key(0)
    t0 = time.time()
    n = x_all.shape[0]
    for i in range(args.iters):
        s = (i * args.batch) % (n - args.batch)
        key, sub = jax.random.split(key)
        diff, rest, opt_state, loss = step(
            diff, rest, opt_state, x_all[s : s + args.batch], sub
        )
        if i % 500 == 0 or i == args.iters - 1:
            print(f"iter {i:5d}  forward KLD {float(loss):.4f}")
    print(f"training wall time: {time.time() - t0:.1f}s")

    model = nf.combine(diff, rest).replace(
        flows=tuple(
            f.set_train(False) if isinstance(f, flows.Residual) else f
            for f in nf.combine(diff, rest).flows
        )
    )
    lp = model.log_prob(x_all[:2048], key=jax.random.key(1))
    print("eval mean log-likelihood:", float(jnp.mean(lp)))


if __name__ == "__main__":
    main()
