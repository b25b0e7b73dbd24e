"""Autoregressive neural spline flow on TwoMoons
(reference: examples/neural_spline_flow.ipynb).

K=16 alternating `AutoregressiveRationalQuadraticSpline` + `LULinearPermute`
layers over a fixed Gaussian base, trained by forward KLD.

Run:  python examples/neural_spline_twomoons.py [--iters 3000]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.utils import enable_compilation_cache


def build_model(K=16, hidden=128, key=None):
    key = key if key is not None else jax.random.key(0)
    layers = []
    for i in range(K):
        layers.append(flows.AutoregressiveRationalQuadraticSpline.create(
            jax.random.fold_in(key, i), 2, 2, hidden,
        ))
        layers.append(flows.LULinearPermute.create(2, seed=i))
    q0 = distributions.DiagGaussian.create(2, trainable=False)
    return nf.NormalizingFlow.create(q0, layers, p=distributions.TwoMoons())


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    model = build_model()
    x_train = model.p.sample(jax.random.key(1), 2**13)
    opt = optax.chain(optax.add_decayed_weights(1e-5), optax.adam(1e-3))
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, key):
        idx = jax.random.randint(key, (args.batch,), 0, x_train.shape[0])
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x_train[idx])
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

    model = nf.combine(diff, rest)
    x_test = model.p.sample(jax.random.key(2), 4096)
    print("held-out NLL:", float(-jnp.mean(model.log_prob(x_test))))
    z, _ = model.sample(jax.random.key(3), 4096)
    print("sample mean radius:", float(jnp.sqrt((z**2).sum(-1)).mean()),
          "(two-moons ~2.0)")


if __name__ == "__main__":
    main()
