"""Class-conditional multi-scale Glow on image data
(reference: examples/glow.ipynb — CIFAR-10, L=3, K=16, hidden 256).

This container has no network egress, so by default the script trains on a
synthetic structured-image dataset with the exact CIFAR-10 geometry
(3x32x32, 10 classes); point --data-npz at a .npz with arrays ``x`` (N,3,32,32
uint8 or [0,1] float) and ``y`` (N,) to train on real data.

Run:  python examples/glow_image.py [--iters 1000] [--L 3 --K 16 --hidden 256]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.utils import preprocessing
from normflows_tpu.utils import enable_compilation_cache


def build_glow(L, K, hidden, input_shape=(3, 32, 32), num_classes=10, key=None):
    """Model construction mirrors examples/glow.ipynb 'Set up model' cell."""
    C, H, W = input_shape
    key = key if key is not None else jax.random.key(0)
    keys = jax.random.split(key, L * K)
    q0, merges, flow_levels = [], [], []
    for i in range(L):
        cs = C * 2 ** (L + 1 - i)
        level = [
            flows.GlowBlock.create(keys[i * K + j], cs, hidden,
                                   split_mode="channel", scale=True)
            for j in range(K)
        ]
        level.append(flows.Squeeze())
        flow_levels.append(level)
        if i > 0:
            merges.append(flows.Merge())
            latent_shape = (C * 2 ** (L - i), H // 2 ** (L - i), W // 2 ** (L - i))
        else:
            latent_shape = (C * 2 ** (L + 1), H // 2**L, W // 2**L)
        q0.append(distributions.ClassCondDiagGaussian.create(latent_shape, num_classes))
    return nf.MultiscaleFlow.create(q0, flow_levels, merges)


def synthetic_images(key, n, shape=(3, 32, 32), num_classes=10):
    """Class-dependent smooth random fields quantized to 256 levels."""
    ky, kf, kp = jax.random.split(key, 3)
    y = jax.random.randint(ky, (n,), 0, num_classes)
    freqs = jax.random.uniform(kf, (num_classes, shape[0], 4, 2), minval=0.5, maxval=3.0)
    h = jnp.linspace(0, 2 * np.pi, shape[1])[:, None]
    w = jnp.linspace(0, 2 * np.pi, shape[2])[None, :]
    phase = jax.random.uniform(kp, (num_classes, shape[0], 4, 2), maxval=2 * np.pi)

    def render(yi):
        f = freqs[yi]
        p = phase[yi]
        img = sum(
            jnp.sin(f[:, k, 0, None, None] * h + p[:, k, 0, None, None])
            * jnp.cos(f[:, k, 1, None, None] * w + p[:, k, 1, None, None])
            for k in range(4)
        )
        return (img - img.min()) / (img.max() - img.min() + 1e-6)

    x = jax.vmap(render)(y)
    x = jnp.round(x * 255.0) / 255.0  # quantize to 256 levels
    return x, y


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--L", type=int, default=3)
    ap.add_argument("--K", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--batch", type=int, default=None,
                    help="training batch size (default 128)")
    ap.add_argument("--lr", type=float, default=None,
                    help="Adam learning rate (default 1e-3)")
    ap.add_argument("--data-npz", type=str, default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="run coupling-net convs in bfloat16 on the MXU (~4x)")
    ap.add_argument("--chunked", action="store_true",
                    help="device-resident data + 10 steps per dispatch "
                         "(training.make_chunked_train_step) — removes the "
                         "per-step host->device batch transfer")
    ap.add_argument("--large-batch-recipe", action="store_true",
                    help="the quality-validated large-batch operating point "
                         "(QUALITY.md): implies --batch 512 --bf16 and a "
                         "warmup-cosine LR schedule peaking at 6e-3 — beats "
                         "the batch-128 constant-LR recipe at equal images "
                         "seen on this hardware")
    args = ap.parse_args()
    if args.large_batch_recipe:
        # The recipe pins batch/lr/bf16 — refuse silently-ignored overrides.
        # None-sentinel defaults (not raw argv scanning) so every spelling is
        # caught: '--batch=512', prefix abbreviations, and explicit values
        # that happen to equal the plain default.
        clashes = [f for f, given in (("--batch", args.batch),
                                      ("--lr", args.lr)) if given is not None]
        if clashes:
            ap.error(
                f"--large-batch-recipe fixes {', '.join(clashes)} "
                "(batch=512, warmup-cosine lr peaking at 6e-3); drop either "
                "the recipe flag or the explicit override"
            )
        args.batch = 512
        args.bf16 = True
    if args.batch is None:
        args.batch = 128
    if args.lr is None:
        args.lr = 1e-3

    if args.data_npz:
        data = np.load(args.data_npz)
        x_all = jnp.asarray(data["x"], jnp.float32)
        if x_all.max() > 1.5:
            x_all = x_all / 255.0
        y_all = jnp.asarray(data["y"], jnp.int32)
    else:
        print("no --data-npz given; using synthetic structured images")
        x_all, y_all = synthetic_images(jax.random.key(7), 8192)

    n_dims = int(np.prod(x_all.shape[1:]))
    scale = preprocessing.Scale(255.0 / 256.0)
    jitter = preprocessing.Jitter(1.0 / 256.0)

    model = build_glow(args.L, args.K, args.hidden, x_all.shape[1:])
    if args.bf16:
        model = nf.utils.set_compute_dtype(model, "bfloat16")
    model = model.init_actnorm(
        jitter(scale(x_all[: args.batch]), jax.random.key(8)), y_all[: args.batch]
    )

    # adamax + decoupled weight decay (reference uses Adamax lr 1e-3 wd 1e-5)
    if args.large_batch_recipe:
        warmup = min(50, max(1, args.iters // 10))
        lr = optax.warmup_cosine_decay_schedule(
            0.0, 6e-3, warmup, args.iters, end_value=6e-3 * 0.05)
    else:
        lr = args.lr
    opt = optax.chain(optax.add_decayed_weights(1e-5), optax.adamax(lr))
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, x, y, key):
        x = jitter(scale(x), key)

        def loss_fn(d):
            return nf.combine(d, rest).forward_kld(x, y)

        loss, grads = jax.value_and_grad(loss_fn)(diff)
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    key = jax.random.key(0)
    t0 = time.time()
    n = x_all.shape[0]
    if args.chunked:
        from normflows_tpu.training import make_chunked_train_step

        if args.iters < 10 or args.iters % 10:
            raise SystemExit(
                "--chunked runs 10 steps per dispatch: --iters must be a"
                f" positive multiple of 10 (got {args.iters})"
            )

        def chunk_loss(m, batch, k):
            xb, yb = batch
            return m.forward_kld(jitter(scale(xb), k), yb)

        model0 = nf.combine(diff, rest)
        state, chunk = make_chunked_train_step(
            model0, opt, chunk_loss, (x_all, y_all), batch_size=args.batch,
            chunk_len=10, shuffle=False)
        for c in range(args.iters // 10):
            key, sub = jax.random.split(key)
            state, metrics = chunk(state, sub)
            i = (c + 1) * 10 - 1
            if i % 100 == 9 or c == args.iters // 10 - 1:
                loss = metrics["loss"][-1]
                bpd = float(loss) / np.log(2) / n_dims + 8
                print(f"iter {i:5d}  nll {float(loss):9.1f}  bits/dim {bpd:.4f}")
        diff, rest = state.diff, state.rest
        loss = metrics["loss"][-1]
    else:
        for i in range(args.iters):
            s = (i * args.batch) % (n - args.batch)
            key, sub = jax.random.split(key)
            diff, opt_state, loss = step(
                diff, opt_state, x_all[s : s + args.batch], y_all[s : s + args.batch], sub
            )
            if i % 100 == 0 or i == args.iters - 1:
                bpd = float(loss) / np.log(2) / n_dims + 8
                print(f"iter {i:5d}  nll {float(loss):9.1f}  bits/dim {bpd:.4f}")
    print(f"training wall time: {time.time() - t0:.1f}s")

    # eval bits/dim on held-out slice (glow.ipynb 'Get bits per dim' cell)
    model = nf.combine(diff, rest)
    xe = jitter(scale(x_all[-1024:]), jax.random.key(9))
    nll = -model.log_prob(xe, y_all[-1024:])
    nll = np.asarray(nll)
    bpd = np.nansum(nll / np.log(2) / n_dims + 8) / np.sum(~np.isnan(nll))
    print(f"eval bits/dim: {bpd:.4f}")

    xs, _ = model.sample(jax.random.key(10), 8, temperature=0.7)
    print("sampled images:", xs.shape, "finite:", bool(jnp.all(jnp.isfinite(xs))))


if __name__ == "__main__":
    main()
