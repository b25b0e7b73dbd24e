"""Real NVP on the TwoMoons target — the reference README example
(reference: README.md:88-135, examples/real_nvp_colab.ipynb).

Run:  python examples/real_nvp_twomoons.py [--iters 4000] [--k 32]
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


def build_model(K, key):
    b = jnp.array([1.0, 0.0])
    layers = []
    for i in range(K):
        key, k1, k2 = jax.random.split(key, 3)
        s = MLP.create(k1, [2, 64, 64, 2], init_zeros=True)
        t = MLP.create(k2, [2, 64, 64, 2], init_zeros=True)
        layers.append(
            flows.MaskedAffineFlow.create(b if i % 2 == 0 else 1 - b, t=t, s=s)
        )
    q0 = distributions.DiagGaussian.create(2)
    return nf.NormalizingFlow.create(q0, layers, p=distributions.TwoMoons())


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--lr", type=float, default=5e-4)
    args = ap.parse_args()

    model = build_model(args.k, jax.random.key(0))
    x_all = model.p.sample(jax.random.key(1), 2**16)

    opt = optax.adamw(args.lr, weight_decay=1e-5)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, x):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x)
        )(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    t0 = time.time()
    for i in range(args.iters):
        s = (i * args.batch) % (2**16 - args.batch)
        diff, opt_state, loss = step(diff, opt_state, x_all[s : s + args.batch])
        if i % 500 == 0 or i == args.iters - 1:
            print(f"iter {i:5d}  forward KLD {float(loss):.4f}")
    print(f"training wall time: {time.time() - t0:.1f}s")

    model = nf.combine(diff, rest)
    z, log_q = model.sample(jax.random.key(2), 4096)
    print("mean log q(x) on target samples:",
          float(jnp.mean(model.log_prob(x_all[:4096]))))
    print("sample ring radius (target = 2):",
          float(jnp.mean(jnp.linalg.norm(z, axis=1))))


if __name__ == "__main__":
    main()
