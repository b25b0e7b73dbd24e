"""MFU report: achieved-FLOPs / peak ratio for the headline training steps.

Prints one JSON line per model with XLA's static FLOP count for the compiled
step (``utils.profiling.cost_report`` semantics, but taken from the SAME
compiled executable that is timed, so the accounting matches the measurement),
the measured step time, achieved FLOP/s, and MFU against the chip's dense
bf16 matmul peak.

Run on the real chip:
    env PYTHONPATH="/root/.axon_site:/root/repo" python examples/mfu_report.py
CPU fallback (plumbing check only; MFU vs TPU peak is meaningless there):
    env -u PYTHONPATH JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python examples/mfu_report.py --iters 3 --tiny
"""

import argparse
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu.utils import enable_compilation_cache
from normflows_tpu.utils.profiling import chip_peak_flops, executable_cost


def timed_compiled_step(step_fn, args, iters, warmup=3, donate=(0, 1),
                        make_inputs=None):
    """AOT-compile, pull cost analysis from the SAME executable, then time
    a chunk of `iters` steps inside ONE `lax.scan` dispatch.

    The earlier pipelined per-call loop paid ~1.2 ms/call of tunnel
    dispatch overhead plus a poorly-amortized sync RTT (measured
    2026-08-22; CLAUDE.md trap (d)).  ``make_inputs(key) -> tuple`` builds
    the step's non-state inputs FRESH per scan iteration from the key
    carry, so no input-dependent work is loop-invariant (hoisting trap).
    FLOPs come from the single-step executable: scan bodies are
    cost-counted once (tests/test_profiling.py).
    """
    jitted = jax.jit(step_fn, donate_argnums=donate)
    compiled = jitted.lower(*args).compile()
    ca = executable_cost(compiled)
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    if make_inputs is None:
        make_inputs = lambda key: args[2:]

    def chunk(diff, opt_state, key):
        def body(carry, _):
            diff, opt_state, key = carry
            key, sub = jax.random.split(key)
            diff, opt_state, loss = step_fn(diff, opt_state,
                                            *make_inputs(sub))
            return (diff, opt_state, key), loss

        (diff, opt_state, key), losses = jax.lax.scan(
            body, (diff, opt_state, key), None, length=iters)
        return diff, opt_state, key, losses[-1]

    chunked = (
        jax.jit(chunk, donate_argnums=(0, 1))
        .lower(args[0], args[1], jax.random.key(9)).compile()
    )
    diff, opt_state, key, loss = chunked(args[0], args[1], jax.random.key(9))
    jax.block_until_ready(loss)  # warm (one chunk = `iters` steps)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        diff, opt_state, key, loss = chunked(diff, opt_state, key)
        jax.block_until_ready(loss)
        rates.append((time.perf_counter() - t0) / iters)
    dt = sorted(rates)[1]
    return flops, byts, dt


def flagship_case(tiny, iters):
    """NSF-cylinder reverse-KLD step (bench.py config, bf16 compute)."""
    import bench

    model = bench.build_model() if not tiny else None
    if tiny:
        from normflows_tpu import flows, distributions

        base = distributions.UniformGaussian.create(
            2, [1], jnp.array([1.0, 2 * np.pi]))
        layers = [
            flows.CircularAutoregressiveRationalQuadraticSpline.create(
                jax.random.key(i), 2, 1, 64, ind_circ=[1], num_bins=10,
                tail_bound=jnp.array([5.0, np.pi]), permute_mask=True, rng_seed=i)
            for i in range(2)
        ]
        model = nf.NormalizingFlow.create(
            base, layers, p=distributions.GaussianVonMises())
    model = nf.utils.set_compute_dtype(model, "bfloat16")
    opt = optax.adam(5e-4)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)
    num_samples = 2**14 if not tiny else 256

    def step(diff, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).reverse_kld(key, num_samples)
        )(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    flops, byts, dt = timed_compiled_step(
        step, (diff, opt_state, jax.random.key(0)), iters,
        make_inputs=lambda key: (key,))  # fresh PRNG key per scanned step
    return "nsf_cylinder_train_step", flops, byts, dt, num_samples


def glow_case(tiny, iters):
    """Glow forward-KLD step (glow.ipynb headline config: L=3 K=16 h=256)."""
    from examples.glow_image import build_glow

    if tiny:
        L, K, hidden, hw, batch = 2, 2, 32, 8, 8
    else:
        L, K, hidden, hw, batch = 3, 16, 256, 32, 128
    model = build_glow(L, K, hidden, (3, hw, hw), 10)
    model = nf.utils.set_compute_dtype(model, "bfloat16")
    x = jax.random.uniform(jax.random.key(1), (batch, 3, hw, hw),
                           minval=0.01, maxval=0.99)
    y = jax.random.randint(jax.random.key(2), (batch,), 0, 10)
    model = model.init_actnorm(x, y)
    opt = optax.chain(optax.add_decayed_weights(1e-5), optax.adamax(1e-3))
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    def step(diff, opt_state, x, y):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x, y))(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    def fresh_batch(key):  # on-device fresh data per scanned step
        kx, ky = jax.random.split(key)
        return (jax.random.uniform(kx, (batch, 3, hw, hw),
                                   minval=0.01, maxval=0.99),
                jax.random.randint(ky, (batch,), 0, 10))

    flops, byts, dt = timed_compiled_step(
        step, (diff, opt_state, x, y), iters, make_inputs=fresh_batch)
    return "glow_train_step", flops, byts, dt, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)  # steps per timed dispatch (~30 ms fixed cost per dispatch)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--only", choices=["flagship", "glow"], default=None)
    args = ap.parse_args()
    enable_compilation_cache()

    dev = jax.devices()[0]
    peak = chip_peak_flops(dev)
    cases = []
    if args.only in (None, "flagship"):
        cases.append(flagship_case(args.tiny, args.iters))
    if args.only in (None, "glow"):
        cases.append(glow_case(args.tiny, args.iters))

    for name, flops, byts, dt, items in cases:
        achieved = flops / dt
        print(json.dumps({
            "step": name,
            "device": dev.device_kind,
            "flops_per_step": flops,
            "bytes_per_step": byts,
            "arithmetic_intensity": round(flops / byts, 2) if byts else None,
            "ms_per_iter": round(dt * 1e3, 3),
            "items_per_sec": round(items / dt, 1),
            "achieved_tflops": round(achieved / 1e12, 3),
            "peak_bf16_tflops": round(peak / 1e12, 1) if peak == peak else None,
            "mfu": round(achieved / peak, 4) if peak == peak else None,
        }), flush=True)


if __name__ == "__main__":
    main()
