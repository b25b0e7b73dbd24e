"""Flow-VAE (reference: examples/vae.py — Planar K=10, latent 40, MNIST).

No network egress here, so the default dataset is synthetic binarized digits
with MNIST geometry (784 dims); pass --data-npz with array ``x`` (N, 784) to
train on real MNIST.

Run:  python examples/vae_flow.py [--epochs 15]
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


def synthetic_digits(key, n, d=784):
    """Random low-rank Bernoulli patterns."""
    k1, k2, k3 = jax.random.split(key, 3)
    protos = jax.nn.sigmoid(3 * jax.random.normal(k1, (16, d)))
    idx = jax.random.randint(k2, (n,), 0, 16)
    probs = protos[idx]
    return (jax.random.uniform(k3, (n, d)) < probs).astype(jnp.float32)


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--latent", type=int, default=40)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--num-samples", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--data-npz", type=str, default=None)
    ap.add_argument("--chunk", type=int, default=1,
                    help=">1: steps per dispatch via the device-resident "
                         "chunked trainer (removes per-step dispatch latency)")
    args = ap.parse_args()

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
    layers = [
        flows.Planar.create((args.latent,), key=jax.random.fold_in(key, i))
        for i in range(args.k)
    ]
    vae = nf.NormalizingFlowVAE.create(prior, q0, layers, decoder)

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
    if args.chunk > 1:
        from normflows_tpu.training import make_chunked_train_step

        state, chunk = make_chunked_train_step(
            vae, opt,
            lambda m, xb, k: -jnp.mean(
                (lambda zq: zq[2] - zq[1])(m(k, xb, args.num_samples))),
            x_all, batch_size=args.batch, chunk_len=args.chunk, shuffle=True,
        )
        for epoch in range(args.epochs):
            losses = []
            for _ in range(steps_per_epoch // args.chunk):
                key, sub = jax.random.split(key)
                state, metrics = chunk(state, sub)
                losses.append(float(jnp.mean(metrics["loss"])))
            print(f"epoch {epoch:3d}  -ELBO {np.mean(losses):.3f}")
        diff, rest = state.diff, state.rest
    else:
        for epoch in range(args.epochs):
            perm = jax.random.permutation(jax.random.fold_in(key, epoch), n)
            x_shuf = x_all[perm]
            total = 0.0
            for i in range(steps_per_epoch):
                xb = x_shuf[i * args.batch : (i + 1) * args.batch]
                key, sub = jax.random.split(key)
                diff, opt_state, loss = step(diff, opt_state, xb, sub)
                total += float(loss)
            print(f"epoch {epoch:3d}  -ELBO {total / steps_per_epoch:.3f}")
    print(f"training wall time: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
