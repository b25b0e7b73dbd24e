"""Inference-path throughput: sampling and density evaluation (serving side).

The training benches (bench.py, glow_batch_sweep.py) cover the optimization
path; serving cares about `sample` and `log_prob` alone.  Measures the
flagship circular-NSF model (reference paper_example_nsf.ipynb config) and
Glow (reference glow.ipynb config) with the same hardened methodology as
bench.py: chunks of iterations inside one on-device `lax.scan` (single
dispatch), scalar-forced, monotonic clock.

Run on the real chip:
    env PYTHONPATH="/root/.axon_site:/root/repo" python examples/inference_bench.py
CPU plumbing check:
    env -u PYTHONPATH JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python examples/inference_bench.py --tiny
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import normflows_tpu as nf
from normflows_tpu.utils import enable_compilation_cache


def _timed_chunk(fn, state, iters, chunks=4):
    """fn: (state, key) -> (state, scalar).  Scan `iters` inside one jit."""

    def chunk(state, key):
        def body(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            state, out = fn(state, sub)
            return (state, key), out

        (state, key), outs = jax.lax.scan(
            body, (state, key), None, length=iters)
        return state, key, outs[-1]

    jitted = jax.jit(chunk)
    state, key, out = jitted(state, jax.random.key(0))
    float(out)  # force
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, key, out = jitted(state, key)
    float(out)
    return (time.perf_counter() - t0) / (chunks * iters)


def flagship_cases(tiny):
    import bench

    if tiny:
        from normflows_tpu import flows, distributions

        base = distributions.UniformGaussian.create(
            2, [1], jnp.array([1.0, 2 * np.pi]))
        layers = [
            flows.CircularAutoregressiveRationalQuadraticSpline.create(
                jax.random.key(i), 2, 1, 64, ind_circ=[1], num_bins=10,
                tail_bound=jnp.array([5.0, np.pi]), permute_mask=True,
                rng_seed=i)
            for i in range(2)
        ]
        model = nf.NormalizingFlow.create(
            base, layers, p=distributions.GaussianVonMises())
        n = 512
    else:
        model = bench.build_model()
        n = 2 ** 14
    model = nf.utils.set_compute_dtype(model, "bfloat16")

    def sample_fn(state, key):
        z, log_q = model.sample(key, n)
        return state, jnp.sum(z) + jnp.sum(log_q)

    # density evaluation on a fixed batch (re-generated once)
    x, _ = model.sample(jax.random.key(1), n)
    x = jax.lax.stop_gradient(x)

    def logprob_fn(state, key):
        # key-dependent jitter keeps the body loop-VARIANT: with a fixed x
        # XLA hoists the whole log_prob out of the scan and the "measurement"
        # times an empty loop (observed on the CPU plumbing run)
        x_k = x + 1e-6 * jax.random.uniform(key, ())
        return state, jnp.sum(model.log_prob(x_k))

    return [("nsf_sample", sample_fn, n), ("nsf_log_prob", logprob_fn, n)]


def glow_cases(tiny):
    from examples.glow_image import build_glow

    if tiny:
        L, K, hidden, hw, n = 2, 2, 32, 8, 8
    else:
        L, K, hidden, hw, n = 3, 16, 256, 32, 512
    model = build_glow(L, K, hidden, (3, hw, hw), 10)
    model = nf.utils.set_compute_dtype(model, "bfloat16")
    x = jax.random.uniform(jax.random.key(1), (n, 3, hw, hw),
                           minval=0.01, maxval=0.99)
    y = jax.random.randint(jax.random.key(2), (n,), 0, 10)
    model = model.init_actnorm(x, y)

    def sample_fn(state, key):
        z, log_q = model.sample(key, n)
        return state, jnp.sum(z.astype(jnp.float32)) + jnp.sum(log_q)

    def logprob_fn(state, key):
        x_k = x * (1.0 + 1e-6 * jax.random.uniform(key, ()))
        return state, jnp.sum(model.log_prob(x_k, y))

    return [("glow_sample", sample_fn, n), ("glow_log_prob", logprob_fn, n)]


def _timed_percall(fn, iters, warmup=3):
    """Per-dispatch timing (async queue, scalar-forced at the end).

    Exported artifacts cannot use the scanned harness: inlining the ~52 MB
    deserialized module into a scan body degrades it ~30x (measured), so
    artifact endpoints are timed per-call — and the LIVE model must then be
    timed the same way for a fair comparison (sample has ~7 ms/call fixed
    overhead under the tunnel in this harness; log_prob does not)."""
    for s in range(warmup):
        out = fn(s)
    float(jnp.sum(jax.tree.leaves(out)[-1]))
    t0 = time.perf_counter()
    for s in range(iters):
        out = fn(s)
    float(jnp.sum(jax.tree.leaves(out)[-1]))
    return (time.perf_counter() - t0) / iters


def exported_flagship_cases(tiny):
    """Time the LOADED StableHLO bundle against the live model under the
    identical per-call harness (the measured live-vs-exported comparison
    docs/serving.md cites)."""
    import tempfile

    from normflows_tpu import serving

    # identical model construction to flagship_cases
    cases = flagship_cases(tiny)
    n = cases[0][2]
    import bench
    from normflows_tpu import flows, distributions

    if tiny:
        base = distributions.UniformGaussian.create(
            2, [1], jnp.array([1.0, 2 * np.pi]))
        layers = [
            flows.CircularAutoregressiveRationalQuadraticSpline.create(
                jax.random.key(i), 2, 1, 64, ind_circ=[1], num_bins=10,
                tail_bound=jnp.array([5.0, np.pi]), permute_mask=True,
                rng_seed=i)
            for i in range(2)
        ]
        model = nf.NormalizingFlow.create(
            base, layers, p=distributions.GaussianVonMises())
    else:
        model = bench.build_model()
    model = nf.utils.set_compute_dtype(model, "bfloat16")

    path = tempfile.mkdtemp(prefix="nf_bundle_")
    serving.save_bundle(model, path, num_samples=n, event_shape=(2,),
                        symbolic_batch=False, batch_size=n)
    bundle = serving.load_bundle(path)
    path_sym = tempfile.mkdtemp(prefix="nf_bundle_sym_")
    serving.save_bundle(model, path_sym, num_samples=n, event_shape=(2,))
    bundle_sym = serving.load_bundle(path_sym)

    x, _ = model.sample(jax.random.key(1), n)
    x = jax.lax.stop_gradient(jnp.asarray(x, jnp.float32))

    live_sample = jax.jit(
        lambda s: model.sample_and_log_prob(jax.random.key(s), n))
    live_lp = jax.jit(lambda v: model.log_prob(x * (1 + 1e-6 * v)))
    exp_sample = jax.jit(lambda s: bundle._sample.call(s.astype(jnp.uint32)))
    exp_lp = jax.jit(lambda v: bundle._log_prob.call(x * (1 + 1e-6 * v)))
    exp_lp_sym = jax.jit(
        lambda v: bundle_sym._log_prob.call(x * (1 + 1e-6 * v)))

    def arg(s):
        return jnp.uint32(s)

    return [
        ("nsf_sample_live_percall", lambda s: live_sample(arg(s)), n),
        ("nsf_sample_exported", lambda s: exp_sample(arg(s)), n),
        ("nsf_log_prob_live_percall", lambda s: live_lp(jnp.float32(s)), n),
        ("nsf_log_prob_exported_concrete",
         lambda s: exp_lp(jnp.float32(s)), n),
        ("nsf_log_prob_exported_symbolic",
         lambda s: exp_lp_sym(jnp.float32(s)), n),
    ]


def main():
    ap = argparse.ArgumentParser()
    # 100 iters/chunk amortizes the ~29 ms per-sync tunnel RTT below 1%;
    # the old default (10, = 40 steps/sync with chunks=4) under-reported
    # fast endpoints by up to ~37% (docs/performance.md "Benchmark
    # methodology").
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--exported", action="store_true",
                    help="also time the loaded StableHLO bundle endpoints "
                         "(live-vs-exported comparison for docs/serving.md)")
    args = ap.parse_args()
    enable_compilation_cache()
    dev = jax.devices()[0]

    cases = [(n, f, i, "scan") for n, f, i in
             flagship_cases(args.tiny) + glow_cases(args.tiny)]
    if args.exported:
        cases += [(n, f, i, "percall") for n, f, i in
                  exported_flagship_cases(args.tiny)]
    for name, fn, items, harness in cases:
        if harness == "percall":
            dt = _timed_percall(fn, max(args.iters, 30))
        else:
            dt = _timed_chunk(fn, jnp.zeros(()), args.iters)
        print(json.dumps({
            "case": name,
            "device": dev.device_kind,
            "batch": items,
            "ms_per_iter": round(dt * 1e3, 3),
            "items_per_sec": round(items / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
