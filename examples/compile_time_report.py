"""Compile-time report: first-compile vs persistent-cache-warm compile for
the three flagship training steps (NSF-cylinder, Glow, residual).

CLAUDE.md admits 1-4 min flagship compiles; this script measures them and
the lever that manages them (`utils.enable_compilation_cache`).  Each model's
full-size train step is AOT-compiled (`jit(...).lower().compile()`) so
compile time is cleanly separated from run time.  Run it TWICE with
``--cache-dir`` pointing at the same fresh directory: the first run measures
cold compiles, the second measures persistent-cache-warm compiles (the
in-process jit cache never survives a process, the persistent cache does).

    d=$(mktemp -d)
    env PYTHONPATH="/root/.axon_site:/root/repo" \
        python examples/compile_time_report.py --cache-dir $d   # cold
    env PYTHONPATH="/root/.axon_site:/root/repo" \
        python examples/compile_time_report.py --cache-dir $d   # warm

Results land in docs/performance.md "Compile time".
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.utils import preprocessing, enable_compilation_cache


def time_compile(name, step_fn, *args):
    t0 = time.perf_counter()
    compiled = jax.jit(step_fn).lower(*args).compile()
    compile_s = time.perf_counter() - t0
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = compiled(*args)
    jax.block_until_ready(out)
    run_ms = (time.perf_counter() - t0) * 1e3
    print(json.dumps({"step": name, "compile_s": round(compile_s, 1),
                      "run_ms": round(run_ms, 2)}), flush=True)


def flagship_step(tiny):
    import bench

    model = bench.build_model(*((2, 32) if tiny else ()))
    model = nf.utils.set_compute_dtype(model, "bfloat16")
    opt = optax.adam(5e-4)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)
    n = 2**8 if tiny else 2**14

    def step(diff, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).reverse_kld(key, n))(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    return step, (diff, opt_state, jax.random.key(0))


def glow_step(tiny):
    from glow_image import build_glow, synthetic_images

    L, K, hidden, side, B = (2, 2, 32, 8, 16) if tiny else (3, 16, 256, 32, 128)
    x_all, y_all = synthetic_images(jax.random.key(7), B + 64, (3, side, side))
    scale = preprocessing.Scale(255.0 / 256.0)
    jitter = preprocessing.Jitter(1.0 / 256.0)
    model = build_glow(L, K, hidden, (3, side, side), key=jax.random.key(0))
    model = nf.utils.set_compute_dtype(model, "bfloat16")
    model = model.init_actnorm(
        jitter(scale(x_all[:64]), jax.random.key(8)), y_all[:64])
    x = jitter(scale(x_all[:B]), jax.random.key(9))
    y = y_all[:B]
    opt = optax.chain(optax.add_decayed_weights(1e-5), optax.adamax(1e-3))
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    def step(diff, opt_state):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x, y))(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    return step, (diff, opt_state)


def residual_step(tiny):
    from normflows_tpu.nets import LipschitzMLP

    K, hidden, B = (2, 16, 64) if tiny else (16, 128, 512)
    layers = []
    for i in range(K):
        net = LipschitzMLP.create(jax.random.key(i), [2, hidden, hidden, 2],
                                  lipschitz_const=0.9)
        layers.append(flows.Residual.create(net, n_samples=1))
    model = nf.NormalizingFlow.create(
        distributions.DiagGaussian.create(2), layers,
        p=distributions.TwoMoons())
    x = model.p.sample(jax.random.key(1), B)
    opt = optax.adam(3e-4)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    def step(diff, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x, key=key))(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    return step, (diff, opt_state, jax.random.key(2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", type=str, default=None,
                    help="persistent compilation cache dir (omit = cache OFF)")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated subset: flagship,glow,residual")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test config")
    args = ap.parse_args()
    if args.cache_dir:
        enable_compilation_cache(args.cache_dir)

    cases = {"flagship": flagship_step, "glow": glow_step,
             "residual": residual_step}
    keep = args.only.split(",") if args.only else list(cases)
    for name in keep:
        step, sargs = cases[name](args.tiny)
        time_compile(name, step, *sargs)


if __name__ == "__main__":
    main()
