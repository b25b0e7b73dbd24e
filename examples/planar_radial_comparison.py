"""Compare Planar, Radial and affine-coupling flows on 2-D energy landscapes
(reference: examples/comparison_plan_rad_aff.ipynb, planar.ipynb — the
Rezende & Mohamed test suite in distributions/prior.py).

Trains each flow family against each prior via reverse KLD.

Run:  python examples/planar_radial_comparison.py [--iters 2000]
"""

import argparse

import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.nets import MLP
from normflows_tpu.utils import enable_compilation_cache


class PriorTarget(nf.Module):
    """Adapter: PriorDistribution -> target with log_prob."""

    prior: nf.Module

    def log_prob(self, z, context=None):
        return self.prior.log_prob(z)


def build(kind, K, key):
    layers = []
    if kind == "planar":
        layers = [
            flows.Planar.create((2,), key=jax.random.fold_in(key, i))
            for i in range(K)
        ]
    elif kind == "radial":
        layers = [
            flows.Radial.create((2,), key=jax.random.fold_in(key, i))
            for i in range(K)
        ]
    elif kind == "affine":
        b = jnp.array([1.0, 0.0])
        for i in range(K):
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            s = MLP.create(k1, [2, 32, 2], init_zeros=True)
            t = MLP.create(k2, [2, 32, 2], init_zeros=True)
            layers.append(
                flows.MaskedAffineFlow.create(b if i % 2 == 0 else 1 - b, t=t, s=s)
            )
    return layers


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    priors = {
        "TwoModes": distributions.TwoModes(loc=2.0, scale=0.2),
        "Sinusoidal": distributions.Sinusoidal(scale=0.2, period=4.0),
        "Sinusoidal_gap": distributions.Sinusoidal_gap(scale=0.35, period=4.0),
        "Sinusoidal_split": distributions.Sinusoidal_split(scale=0.4, period=4.0),
        "Smiley": distributions.Smiley(scale=0.2),
    }

    for pname, prior in priors.items():
        for kind in ["planar", "radial", "affine"]:
            model = nf.NormalizingFlow.create(
                distributions.DiagGaussian.create(2),
                build(kind, args.k, jax.random.key(hash(kind) % 1000)),
                p=PriorTarget(prior=prior),
            )
            opt = optax.adam(1e-3)
            diff, rest = nf.partition(model)
            opt_state = opt.init(diff)

            @jax.jit
            def step(diff, opt_state, key):
                loss, grads = jax.value_and_grad(
                    lambda d: nf.combine(d, rest).reverse_kld(key, 512)
                )(diff)
                updates, opt_state = opt.update(grads, opt_state, diff)
                return optax.apply_updates(diff, updates), opt_state, loss

            key = jax.random.key(0)
            first = last = None
            for i in range(args.iters):
                key, sub = jax.random.split(key)
                diff, opt_state, loss = step(diff, opt_state, sub)
                if i == 0:
                    first = float(loss)
                last = float(loss)
            print(f"{pname:18s} {kind:7s}  reverse KLD {first:8.3f} -> {last:8.3f}")


if __name__ == "__main__":
    main()
