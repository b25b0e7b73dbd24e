"""Large-batch Glow recipe: make the hardware-optimal batch usable.

docs/performance.md establishes batch 512 bf16 as the best hardware operating
point (26.4% MFU, 13.6k img/s — 2.1x the reference's batch-128 throughput),
but the naive equal-images A/B showed it LOSES on quality at the reference's
constant LR (2.285 vs 1.363 bits/dim): 4x fewer optimizer steps at the same
step size.  This script ships and validates the fix — LR-scaled schedules
with warmup — under a controlled protocol:

  * identical model init (same PRNG key), identical ActNorm init batch
    (first 256 images, independent of the training batch size),
  * identical synthetic CIFAR-geometry dataset, identical images seen
    (batch x iters = const), identical held-out eval slice + jitter key,
  * reference optimizer (Adamax + decoupled wd 1e-5, glow.ipynb train cell),
    only the LR schedule varies.

Recipes swept: naive constant LR (the documented failure), linear scaling
(lr x batch/128) with warmup, linear scaling + cosine decay, sqrt scaling
with warmup.  Output: one JSON row per config with eval bits/dim; the
QUALITY.md row comes from this script.

Run:  env PYTHONPATH="/root/.axon_site:/root/repo" python examples/glow_large_batch_recipe.py
Tiny CPU check: ... --tiny
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu.utils import preprocessing, enable_compilation_cache
from normflows_tpu.training import make_chunked_train_step

from glow_image import build_glow, synthetic_images


def make_schedule(kind, base_lr, warmup, iters):
    if kind == "const":
        return base_lr
    if kind == "warmup_const":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup), lambda _: base_lr],
            [warmup],
        )
    if kind == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup, iters, end_value=base_lr * 0.05
        )
    raise ValueError(kind)


def run_config(name, x_all, y_all, L, K, hidden, batch, iters, base_lr,
               schedule, warmup, chunk_len=10):
    n_dims = int(np.prod(x_all.shape[1:]))
    scale = preprocessing.Scale(255.0 / 256.0)
    jitter = preprocessing.Jitter(1.0 / 256.0)

    model = build_glow(L, K, hidden, x_all.shape[1:], key=jax.random.key(0))
    model = nf.utils.set_compute_dtype(model, "bfloat16")
    # ActNorm init batch independent of the training batch size -> identical
    # starting function for every config
    model = model.init_actnorm(
        jitter(scale(x_all[:256]), jax.random.key(8)), y_all[:256]
    )

    lr = make_schedule(schedule, base_lr, warmup, iters)
    opt = optax.chain(optax.add_decayed_weights(1e-5), optax.adamax(lr))

    def loss_fn(m, data, k):
        xb, yb = data
        return m.forward_kld(jitter(scale(xb), k), yb)

    n_train = x_all.shape[0] - 1024  # last 1024 rows are the eval-only slice
    state, chunk = make_chunked_train_step(
        model, opt, loss_fn, (x_all[:n_train], y_all[:n_train]),
        batch_size=batch, chunk_len=chunk_len, shuffle=False,
    )
    t0 = time.time()
    losses = []
    for _ in range(iters // chunk_len):
        state, metrics = chunk(state, jax.random.key(int(state.step)))
        losses.append(float(metrics["loss"][-1]))
    wall = time.time() - t0

    model = nf.combine(state.diff, state.rest)
    xe = jitter(scale(x_all[-1024:]), jax.random.key(9))
    nll = np.asarray(-model.log_prob(xe, y_all[-1024:]))
    bpd = float(np.nansum(nll / np.log(2) / n_dims + 8) / np.sum(~np.isnan(nll)))
    row = {
        "config": name, "batch": batch, "iters": iters,
        "images_seen": batch * iters, "schedule": schedule,
        "base_lr": base_lr, "warmup": warmup,
        "final_train_bpd": round(losses[-1] / np.log(2) / n_dims + 8, 4),
        "eval_bits_per_dim": round(bpd, 4),
        "train_wall_s": round(wall, 1),
        "img_per_s": round(batch * iters / wall, 0),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--images", type=int, default=256_000,
                    help="images seen per config (batch x iters)")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated config names to run")
    args = ap.parse_args()
    enable_compilation_cache()

    if args.tiny:
        L, K, hidden, n_data = 2, 2, 32, 2048 + 1024
        shape = (3, 8, 8)
        images = 4000
        big, small = 64, 16
    else:
        L, K, hidden, n_data = 3, 16, 256, 8192 + 1024
        shape = (3, 32, 32)
        images = args.images
        big, small = 512, 128

    x_all, y_all = synthetic_images(jax.random.key(7), n_data, shape)

    scale_f = big // small  # 4
    configs = [
        # the reference recipe (control)
        ("ref_b128", small, images // small, 1e-3, "const", 0),
        # the documented failure: big batch, same constant LR
        ("naive_b512", big, images // big, 1e-3, "const", 0),
        # linear LR scaling + warmup (Goyal et al. 2017 recipe)
        ("linear_b512", big, images // big, 1e-3 * scale_f, "warmup_const", 50),
        # linear scaling + cosine decay
        ("linear_cos_b512", big, images // big, 1e-3 * scale_f, "warmup_cosine", 50),
        # sqrt scaling (adaptive-optimizer heuristic)
        ("sqrt_b512", big, images // big, 1e-3 * scale_f ** 0.5, "warmup_const", 50),
        # linear + cosine with longer warmup
        ("linear_cos_w100_b512", big, images // big, 1e-3 * scale_f,
         "warmup_cosine", 100),
        # 1.5x-linear + cosine — the shipped recipe (QUALITY.md)
        ("linear15_cos_b512", big, images // big, 1.5e-3 * scale_f,
         "warmup_cosine", 50),
    ]
    if args.only:
        keep = set(args.only.split(","))
        configs = [c for c in configs if c[0] in keep]

    rows = []
    for name, batch, iters, lr, sched, warmup in configs:
        # tiny/short runs: warmup must stay shorter than the run itself
        # (cosine decay_steps = iters - warmup must be positive); no effect
        # at the full 256k-image protocol (iters >= 500, warmups 50/100)
        warmup = min(warmup, max(1, iters // 5))
        rows.append(run_config(name, x_all, y_all, L, K, hidden, batch,
                               iters, lr, sched, warmup))

    ref = next((r for r in rows if r["config"] == "ref_b128"), None)
    if ref:
        for r in rows:
            r["gap_vs_ref_bpd"] = round(
                r["eval_bits_per_dim"] - ref["eval_bits_per_dim"], 4)
        print(json.dumps({"summary": [
            {k: r[k] for k in ("config", "eval_bits_per_dim",
                               "gap_vs_ref_bpd", "img_per_s")}
            for r in rows
        ]}))


if __name__ == "__main__":
    main()
