"""Changing the base distribution: Gaussian vs Gaussian-mixture base
(reference: examples/change_base_distribution.ipynb).

The same Real-NVP stack (AffineCouplingBlock + swap-Permute) is trained on
TwoMoons twice — once from a unimodal `DiagGaussian` base and once from a
two-mode `GaussianMixture` base whose modes align with the moons.  The
mixture base removes the topological mismatch, improving the fit.

Run:  python examples/change_base.py [--iters 2000]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.nets import MLP
from normflows_tpu.utils import enable_compilation_cache


def build_flows(num_layers=32, key=None):
    key = key if key is not None else jax.random.key(0)
    layers = []
    for i in range(num_layers):
        param_map = MLP.create(jax.random.fold_in(key, i), [1, 64, 64, 2],
                               init_zeros=True)
        layers.append(flows.AffineCouplingBlock.create(param_map))
        layers.append(flows.Permute.create(2, mode="swap"))
    return layers


def train(model, iters, seed=0):
    opt = optax.adam(5e-4)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)
    x_train = model.p.sample(jax.random.key(100 + seed), 2**13)

    @jax.jit
    def step(diff, opt_state, key):
        idx = jax.random.randint(key, (512,), 0, x_train.shape[0])
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x_train[idx])
        )(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    key = jax.random.key(seed)
    for i in range(iters):
        key, sub = jax.random.split(key)
        diff, opt_state, loss = step(diff, opt_state, sub)
    model = nf.combine(diff, rest)
    x_test = model.p.sample(jax.random.key(999), 4096)
    return float(-jnp.mean(model.log_prob(x_test)))


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    args = ap.parse_args()
    target = distributions.TwoMoons()

    t0 = time.time()
    gauss = nf.NormalizingFlow.create(
        distributions.DiagGaussian.create(2), build_flows(), p=target
    )
    nll_gauss = train(gauss, args.iters, seed=0)
    print(f"DiagGaussian base:     held-out NLL {nll_gauss:.4f}")

    mix = nf.NormalizingFlow.create(
        distributions.GaussianMixture.create(
            2, 2, loc=jnp.array([[-2.0, 0.0], [2.0, 0.0]]),
            scale=jnp.full((2, 2), 0.3),
        ),
        build_flows(key=jax.random.key(1)),
        p=target,
    )
    nll_mix = train(mix, args.iters, seed=1)
    print(f"GaussianMixture base:  held-out NLL {nll_mix:.4f}")
    print(f"wall time {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
