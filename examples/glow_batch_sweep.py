"""Glow batch-scaling A/B + roofline bounds (docs/performance.md evidence).

Tests the claim that Glow's low MFU at the reference config (L=3, K=16,
hidden 256, batch 128 — examples/glow.ipynb) comes from the MXU being
starved by small spatial extents: if so, MFU must rise with batch size
(more rows per conv matmul at fixed spatial geometry).

Each row: images/s, achieved TFLOP/s, MFU (flops from the SAME AOT
executable that is timed), XLA's static bytes-accessed estimate, and the
*physical-feasibility bound*: bytes the HBM could deliver in the measured
time.  When the static estimate exceeds that bound, the estimate is a
pre-fusion overestimate (buffers counted that fusion never materializes)
— the check that repaired the round-2 roofline narrative.

Also probes the chip's attainable HBM bandwidth (streaming triad) and
attainable matmul peak (large bf16 matmul) so the bounds use MEASURED
ceilings, not datasheet numbers.

Run on the real chip:
    env PYTHONPATH="/root/.axon_site:/root/repo" python examples/glow_batch_sweep.py
CPU plumbing check:
    env -u PYTHONPATH JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python examples/glow_batch_sweep.py --tiny
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu.utils import enable_compilation_cache
from normflows_tpu.utils.profiling import chip_peak_flops, executable_cost


def _timed_scalar(fn, *args):
    """Wall time of fn(*args) forced via scalar download.

    The axon tunnel's block_until_ready is only reliable for scalar
    outputs (large-array downloads are deferred), so ceiling probes must
    end in a reduction and be timed via float() — measured 2026-08-21:
    an identical big-array probe 'measured' 300 TB/s with
    block_until_ready and 507 GB/s with scalar forcing.
    """
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def probe_hbm_bandwidth(n_bytes=2 ** 30, iters=20):
    """Streaming update x = 0.999*x + b under ONE on-device lax.scan
    (carry-dependent: no iteration can be elided).  Traffic per iteration:
    read x + read b + write x = 3 arrays.  The device-resident inputs are
    created on device; tunnel RTT is cancelled by differencing a long and
    a short scan.  Reports bytes/s — the *attainable* HBM ceiling."""
    n = n_bytes // 4

    @jax.jit
    def make():
        return jnp.full((n,), 0.5, jnp.float32), jnp.ones((n,), jnp.float32)

    x, b = make()
    float(x[0])  # force device materialization

    def runner(length):
        @jax.jit
        def run(x, b):
            def body(x, _):
                return 0.999 * x + b, None

            x, _ = jax.lax.scan(body, x, None, length=length)
            return x.sum()

        float(run(x, b))  # warmup/compile
        return min(_timed_scalar(run, x, b) for _ in range(3))

    dt = runner(3 * iters) - runner(iters)  # marginal: RTT cancels
    return 3 * n * 4 * (2 * iters) / dt


def probe_matmul_peak(m=8192, iters=8):
    """Chained bf16 matmuls under one lax.scan, scalar-forced, RTT
    cancelled: attainable MXU ceiling (FLOP/s)."""

    @jax.jit
    def make():
        return (jnp.eye(m) + 0.001).astype(jnp.bfloat16)

    a = make()
    float(a[0, 0])

    def runner(length):
        @jax.jit
        def run(x):
            def body(x, _):
                return x @ a, None

            x, _ = jax.lax.scan(body, x, None, length=length)
            return x.astype(jnp.float32).sum()

        x = a
        float(run(x))
        return min(_timed_scalar(run, x) for _ in range(3))

    dt = runner(3 * iters) - runner(iters)
    return 2 * m ** 3 * (2 * iters) / dt


def glow_step_case(batch, dtype, L, K, hidden, hw, iters):
    from examples.glow_image import build_glow

    model = build_glow(L, K, hidden, (3, hw, hw), 10)
    if dtype == "bfloat16":
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

    compiled = (
        jax.jit(step, donate_argnums=(0, 1))
        .lower(diff, opt_state, x, y).compile()
    )
    ca = executable_cost(compiled)
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    # Scan `iters` steps inside ONE dispatch (the per-call loop paid
    # ~1.2 ms/call of tunnel dispatch overhead + a poorly-amortized sync
    # RTT — ~7% at this step size, confirmed against the scan-differenced
    # decomposition's 35.07 ms).  Inputs are generated ON DEVICE per step
    # from the key carry (fresh x/y every iteration), both to keep XLA from
    # hoisting input-dependent work out of the loop (CLAUDE.md trap) and to
    # match real training; the RNG cost is ~0.01 ms against the HBM rate.
    # FLOPs still come from the single-step executable above (scan bodies
    # are cost-counted once).
    def chunk(diff, opt_state, key):
        def body(carry, _):
            diff, opt_state, key = carry
            key, kx, ky = jax.random.split(key, 3)
            xs = jax.random.uniform(kx, (batch, 3, hw, hw),
                                    minval=0.01, maxval=0.99)
            ys = jax.random.randint(ky, (batch,), 0, 10)
            diff, opt_state, loss = step(diff, opt_state, xs, ys)
            return (diff, opt_state, key), loss

        (diff, opt_state, key), losses = jax.lax.scan(
            body, (diff, opt_state, key), None, length=iters)
        return diff, opt_state, key, losses[-1]

    chunked = (
        jax.jit(chunk, donate_argnums=(0, 1))
        .lower(diff, opt_state, jax.random.key(3)).compile()
    )
    key = jax.random.key(3)
    diff, opt_state, key, loss = chunked(diff, opt_state, key)  # warm
    jax.block_until_ready(loss)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        diff, opt_state, key, loss = chunked(diff, opt_state, key)
        jax.block_until_ready(loss)
        rates.append((time.perf_counter() - t0) / iters)
    dt = sorted(rates)[1]
    return flops, byts, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)  # steps per timed dispatch
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batches", type=str, default="128,256,512,1024")
    ap.add_argument("--dtypes", type=str, default="float32,bfloat16")
    ap.add_argument("--probes-only", action="store_true")
    args = ap.parse_args()
    enable_compilation_cache()

    dev = jax.devices()[0]
    peak = chip_peak_flops(dev)
    bw = probe_hbm_bandwidth(2 ** 30 if not args.tiny else 2 ** 24)
    mm_peak = probe_matmul_peak(8192 if not args.tiny else 512)
    print(json.dumps({
        "probe": "ceilings", "device": dev.device_kind,
        "hbm_triad_gbps": round(bw / 1e9, 1),
        "matmul_peak_tflops": round(mm_peak / 1e12, 1),
        "datasheet_peak_tflops": round(peak / 1e12, 1) if peak == peak else None,
        "measured_ridge_flops_per_byte": round(mm_peak / bw, 1),
    }), flush=True)
    if args.probes_only:
        return

    if args.tiny:
        L, K, hidden, hw = 2, 2, 32, 8
        batches = [8, 16]
        dtypes = ["float32"]
    else:
        L, K, hidden, hw = 3, 16, 256, 32
        batches = [int(b) for b in args.batches.split(",")]
        dtypes = args.dtypes.split(",")

    denom = mm_peak if mm_peak == mm_peak else peak
    for dtype in dtypes:
        for batch in batches:
            flops, byts, dt = glow_step_case(
                batch, dtype, L, K, hidden, hw, args.iters)
            feasible_bytes = bw * dt  # most HBM could deliver in dt
            print(json.dumps({
                "step": "glow_train_step", "dtype": dtype, "batch": batch,
                "ms_per_iter": round(dt * 1e3, 2),
                "images_per_sec": round(batch / dt, 1),
                "flops_per_step": flops,
                "achieved_tflops": round(flops / dt / 1e12, 2),
                "mfu_vs_datasheet": round(flops / dt / peak, 4)
                if peak == peak else None,
                "mfu_vs_measured_matmul": round(flops / dt / denom, 4),
                "xla_bytes_estimate_gb": round(byts / 2 ** 30, 2),
                "hbm_feasible_bytes_gb": round(feasible_bytes / 2 ** 30, 2),
                "bytes_estimate_exceeds_feasible": bool(byts > feasible_bytes),
            }), flush=True)


if __name__ == "__main__":
    main()
