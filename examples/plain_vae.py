"""Plain (no-flow) VAE baseline (reference: examples/plain_vae.py).

The baseline the flow-VAE (examples/vae_flow.py) is compared against: the
same encoder/decoder geometry (784 -> 512 -> 256 -> latent 40, mirrored
decoder) with NO flow layers on the posterior — realized here as a
NormalizingFlowVAE with an empty flow list, which reduces exactly to the
reference's reparametrized Gaussian-posterior VAE (plain_vae.py:86-140).

No network egress here, so the default dataset is synthetic binarized digits
with MNIST geometry; pass --data-npz with array ``x`` (N, 784) for real
MNIST.  Run both scripts with the same --data-npz / --epochs to reproduce
the reference's flow-vs-plain ELBO comparison.

Run:  python examples/plain_vae.py [--epochs 15]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import distributions
from normflows_tpu.nets import MLP
from normflows_tpu.utils import enable_compilation_cache

from vae_flow import synthetic_digits


def main(argv=None):
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--latent", type=int, default=40)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--num-samples", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--data-npz", type=str, default=None)
    ap.add_argument("--chunk", type=int, default=1,
                    help=">1: steps per dispatch via the device-resident "
                         "chunked trainer (removes per-step dispatch latency)")
    args = ap.parse_args(argv)

    if args.data_npz:
        x_all = jnp.asarray(np.load(args.data_npz)["x"], jnp.float32)
    else:
        print("no --data-npz given; using synthetic binarized digits")
        x_all = synthetic_digits(jax.random.key(0), 2**14)
    d = x_all.shape[1]

    key = jax.random.key(1)
    k_enc, k_dec, key = jax.random.split(key, 3)
    encoder_net = MLP.create(k_enc, [d, 512, 256, 2 * args.latent])
    decoder_net = MLP.create(k_dec, [args.latent, 256, 512, d])
    prior = distributions.DiagGaussian.create(args.latent)
    q0 = distributions.NNDiagGaussian(net=encoder_net)
    decoder = distributions.NNBernoulliDecoder(net=decoder_net)
    vae = nf.NormalizingFlowVAE.create(prior, q0, [], decoder)  # no flows

    opt = optax.adam(args.lr)
    diff, rest = nf.partition(vae)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, x, key):
        def loss_fn(d_):
            m = nf.combine(d_, rest)
            _, log_q, log_p = m(key, x, num_samples=args.num_samples)
            return -jnp.mean(log_p - log_q)  # negative ELBO

        loss, grads = jax.value_and_grad(loss_fn)(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    n = x_all.shape[0]
    steps_per_epoch = n // args.batch
    t0 = time.time()
    last = 0.0
    for epoch in range(args.epochs):
        perm = jax.random.permutation(jax.random.fold_in(key, epoch), n)
        x_shuf = x_all[perm]
        total = 0.0
        for i in range(steps_per_epoch):
            xb = x_shuf[i * args.batch : (i + 1) * args.batch]
            key, sub = jax.random.split(key)
            diff, opt_state, loss = step(diff, opt_state, xb, sub)
            total += float(loss)
        last = total / steps_per_epoch
        print(f"epoch {epoch:3d}  -ELBO {last:.3f}")
    print(f"training wall time: {time.time() - t0:.1f}s")
    return last


if __name__ == "__main__":
    main()
