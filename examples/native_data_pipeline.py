"""Feeding image training from the native C++ data pipeline.

Demonstrates `normflows_tpu.data`: a multithreaded C++ producer does the
whole dataloader-side transform stack (per-epoch shuffle, 255/256 scaling,
uniform dequantization jitter, logit) off the Python thread, while
`prefetch_to_device` keeps batches already transferred so the train step
never waits on host work.  Replaces the reference's torch DataLoader +
transform pipeline (reference utils/preprocessing.py:4-57,
examples/glow.ipynb data cells).

Run:  python examples/native_data_pipeline.py [--iters 200]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.data import NativeImageLoader, prefetch_to_device
from normflows_tpu.utils import enable_compilation_cache


def build_model(shape=(3, 8, 8), num_classes=10, key=None):
    """Small 2-level Glow over logit-space images."""
    C, H, W = shape
    key = key if key is not None else jax.random.key(0)
    L, K = 2, 4
    keys = jax.random.split(key, L * K)
    q0, merges, flow_levels = [], [], []
    for i in range(L):
        cs = C * 2 ** (L + 1 - i)
        level = [
            flows.GlowBlock.create(keys[i * K + j], cs, 64,
                                   split_mode="channel", scale=True)
            for j in range(K)
        ]
        level.append(flows.Squeeze())
        flow_levels.append(level)
        if i > 0:
            merges.append(flows.Merge())
            latent = (C * 2 ** (L - i), H // 2 ** (L - i), W // 2 ** (L - i))
        else:
            latent = (C * 2 ** (L + 1), H // 2**L, W // 2**L)
        q0.append(distributions.ClassCondDiagGaussian.create(latent, num_classes))
    return nf.MultiscaleFlow.create(q0, flow_levels, merges)


def main():
    # persistent XLA compilation cache: first-compile cost is
    # paid once per config (docs/performance.md "Compile time")
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    # synthetic uint8 "image" dataset (no egress in this container)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(4096, 3, 8, 8), dtype=np.uint8)
    labels = rng.integers(0, 10, size=(4096,), dtype=np.int64)

    loader = NativeImageLoader(
        images, labels, batch_size=args.batch, shuffle=True, seed=1,
        num_workers=args.workers, jitter=True, logit=True, alpha=0.05,
    )
    print(f"native pipeline: {loader.is_native}, "
          f"{loader.batches_per_epoch} batches/epoch")

    model = build_model()
    x0, y0, _ = next(loader)
    model = model.init_actnorm(jnp.asarray(x0), jnp.asarray(y0))
    opt = optax.adamax(1e-3)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, x, y):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x, y)
        )(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    stream = prefetch_to_device(loader, size=2)
    # warmup/compile
    x, y, _ = next(stream)
    diff, opt_state, loss = step(diff, opt_state, x, y)
    jax.block_until_ready(loss)

    t0 = time.time()
    for i in range(args.iters):
        x, y, epoch = next(stream)
        diff, opt_state, loss = step(diff, opt_state, x, y)
        if i % 50 == 0:
            print(f"iter {i:4d} epoch {epoch} loss {float(loss):10.1f}")
    jax.block_until_ready(loss)
    dt = time.time() - t0
    print(f"{args.iters} iters in {dt:.2f}s — "
          f"{args.iters * args.batch / dt:,.0f} images/s end-to-end")
    loader.close()


if __name__ == "__main__":
    main()
