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
from normflows_tpu.utils import enable_compilation_cache


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
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--chunk", type=int, default=1,
                    help=">1: run that many steps per dispatch with the "
                         "device-resident chunked trainer — the per-step "
                         "device time is ~0.8 ms, so per-iteration dispatch "
                         "(tunnel RTT ~25 ms here) dominates wall time "
                         "otherwise")
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
    if args.chunk > 1:
        from normflows_tpu.training import make_chunked_train_step

        state, chunk = make_chunked_train_step(
            nf.combine(diff, rest), opt,
            lambda m, xb, k: m.forward_kld(xb, key=k),
            x_all, batch_size=args.batch, chunk_len=args.chunk,
            shuffle=False, update_lipschitz_iters=50,
        )
        for c in range(args.iters // args.chunk):
            key, sub = jax.random.split(key)
            state, metrics = chunk(state, sub)
            i = (c + 1) * args.chunk - 1
            if (c * args.chunk) % 500 < args.chunk or c == args.iters // args.chunk - 1:
                print(f"iter {i:5d}  forward KLD {float(metrics['loss'][-1]):.4f}")
        diff, rest = state.diff, state.rest
    else:
        for i in range(args.iters):
            s = (i * args.batch) % (n - args.batch)
            key, sub = jax.random.split(key)
            diff, rest, opt_state, loss = step(
                diff, rest, opt_state, x_all[s : s + args.batch], sub
            )
            if i % 500 == 0 or i == args.iters - 1:
                print(f"iter {i:5d}  forward KLD {float(loss):.4f}")
    wall = time.time() - t0
    print(f"training wall time: {wall:.1f}s "
          f"({args.iters * args.batch / wall:,.0f} samples/s)")

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
