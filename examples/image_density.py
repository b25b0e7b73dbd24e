"""Learn a 2-D density given by image intensities — the reference
``examples/image.ipynb`` workflow (reference: examples/image.ipynb,
distributions/prior.py:21-104).

The reference loads an arbitrary grayscale image with matplotlib, turns its
intensities into an unnormalized density via ``ImagePrior``, and trains a
K=32 masked-affine Real NVP on rejection-sampled points with forward KLD.
This container has no image files (and no egress), so the image is generated
procedurally — a smiley built from the same primitives as the reference's
``Smiley`` prior — but any ``(H, W)`` float array works the same way
(pass ``--image-npy yourfile.npy``).

Run:  python examples/image_density.py [--iters 4000]
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


def smiley_image(n=200):
    """Procedural grayscale smiley on an (n, n) grid over [-3, 3]^2."""
    xs = np.linspace(-3, 3, n)
    xx, yy = np.meshgrid(xs, xs)  # row = y (imshow convention), col = x
    yy = -yy
    r = np.sqrt(xx**2 + yy**2)
    face = np.exp(-0.5 * ((r - 2.4) / 0.18) ** 2)
    eyes = np.exp(-0.5 * (((xx - 0.9) ** 2 + (yy - 0.9) ** 2)) / 0.06) + np.exp(
        -0.5 * (((xx + 0.9) ** 2 + (yy - 0.9) ** 2)) / 0.06
    )
    mouth_r = np.sqrt(xx**2 + (yy + 0.2) ** 2)
    mouth = np.exp(-0.5 * ((mouth_r - 1.3) / 0.15) ** 2) * (yy < -0.7)
    return np.clip(face + eyes + mouth, 0.0, 1.0)


def build_model(K, key):
    # Reference config: K=32 MaskedAffineFlow with MLP([2, 4, 4, 2]) s and t
    # nets on alternating masks (image.ipynb model cell).  We widen the nets
    # to [2, 64, 64, 2] — the reference's 4-unit nets underfit badly and the
    # notebook itself is a template, not a benchmark.
    b = jnp.array([0.0, 1.0])
    layers = []
    for i in range(K):
        key, k1, k2 = jax.random.split(key, 3)
        s = MLP.create(k1, [2, 64, 64, 2], init_zeros=True)
        t = MLP.create(k2, [2, 64, 64, 2], init_zeros=True)
        layers.append(
            flows.MaskedAffineFlow.create(b if i % 2 == 0 else 1 - b, t=t, s=s)
        )
    q0 = distributions.DiagGaussian.create(2)
    return nf.NormalizingFlow.create(q0, layers)


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--image-npy", type=str, default=None,
                    help="optional (H, W) grayscale array; defaults to a "
                    "procedural smiley")
    args = ap.parse_args()

    img = np.load(args.image_npy) if args.image_npy else smiley_image()
    target = distributions.ImagePrior.create(img)

    model = build_model(args.k, jax.random.key(0))
    x_all = np.asarray(target.sample(jax.random.key(1), 2**16))

    opt = optax.adamw(args.lr, weight_decay=1e-4)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, x):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x)
        )(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    if args.batch > x_all.shape[0]:
        raise SystemExit(
            f"--batch {args.batch} exceeds the {x_all.shape[0]}-sample pool")
    t0 = time.time()
    for i in range(args.iters):
        # cycle through the pool; the +1 makes the final `batch` rows reachable
        # and keeps the modulus positive for batch == pool size
        s = (i * args.batch) % (x_all.shape[0] - args.batch + 1)
        diff, opt_state, loss = step(
            diff, opt_state, jnp.asarray(x_all[s : s + args.batch])
        )
        if i % 500 == 0 or i == args.iters - 1:
            print(f"iter {i:5d}  forward KLD {float(loss):.4f}")
    print(f"training wall time: {time.time() - t0:.1f}s")

    model = nf.combine(diff, rest)
    # Held-out fit: mean model log-prob on fresh target samples, and the
    # fraction of model samples that land on bright (>10% max) pixels.
    x_test = target.sample(jax.random.key(2), 8192)
    print("held-out mean log q(x):",
          float(jnp.mean(model.log_prob(x_test))))
    z, _ = model.sample(jax.random.key(3), 8192)
    size = jnp.asarray(target.image.shape, jnp.float32)
    z_ = jnp.clip((z - target.shift) / target.scale, 0.0, 1.0)
    ind = (z_ * (size - 1)).astype(jnp.int32)
    on_img = jnp.mean((target.image[ind[:, 0], ind[:, 1]] > 0.1).astype(jnp.float32))
    print(f"model samples on bright pixels: {float(on_img):.3f}")


if __name__ == "__main__":
    main()
