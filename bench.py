"""Headline benchmark: NSF-cylinder reverse-KLD training throughput.

Exact reference config (examples/paper_example_nsf.ipynb; BASELINE.md row 2):
K=12 circular autoregressive RQ-spline layers (hidden 512, 10 bins,
tail_bound [5, pi]), UniformGaussian base, GaussianVonMises target, Adam 5e-4,
2^14 samples per iteration.  Metric: samples/sec through the full jitted
training step (sample + reverse-KLD loss + grad + optimizer update) on one
chip.  ``vs_baseline`` = ratio vs the reference torch implementation measured
in this container (BASELINE_MEASURED.json; the reference publishes no
numbers of its own).

Prints ONE JSON line.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.utils import enable_compilation_cache
from normflows_tpu.utils.profiling import chip_peak_flops, executable_cost

BASELINE_SAMPLES_PER_SEC = 535.2  # see BASELINE_MEASURED.json


def build_model(K=12, hidden=512, num_bins=10):
    base = distributions.UniformGaussian.create(2, [1], jnp.array([1.0, 2 * np.pi]))
    layers = [
        flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.key(i), 2, 1, hidden, ind_circ=[1], num_bins=num_bins,
            tail_bound=jnp.array([5.0, np.pi]), permute_mask=True, rng_seed=i,
        )
        for i in range(K)
    ]
    return nf.NormalizingFlow.create(
        base, layers, p=distributions.GaussianVonMises()
    )


def main():
    enable_compilation_cache()
    model = build_model()
    # bf16 MADE matmuls on the MXU: convergence-validated — 10k-iter training
    # reaches held-out KL(q||p) = 1.2e-4 nats (f32: 1.6e-4; both are MC noise
    # of the 2^16-sample estimator).  See QUALITY.md.
    model = nf.utils.set_compute_dtype(model, "bfloat16")
    opt = optax.adam(5e-4)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)
    num_samples = 2**14

    def step(diff, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).reverse_kld(key, num_samples)
        )(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    # Measure a CHUNK of steps inside one on-device lax.scan: one dispatch
    # per chunk, so the measurement is immune to host dispatch / device-tunnel
    # latency, and timed with the monotonic clock (time.time() is subject to
    # NTP steps, which once produced a physically impossible >100% MFU here).
    # chunk_len amortizes the ~30 ms fixed cost per DISPATCH through the
    # device tunnel (pipelining does not hide it — measured 2026-08-22: 2
    # pipelined 100-step chunks still paid ~26 ms each): at 10 steps/chunk
    # the harness under-reported the step by ~13% vs the differenced
    # per-step cost; at 500 the residue is ~1% (docs/performance.md
    # "Benchmark methodology").
    chunk_len = 500

    def chunk(diff, opt_state, key):
        def body(carry, _):
            diff, opt_state, key = carry
            key, sub = jax.random.split(key)
            diff, opt_state, loss = step(diff, opt_state, sub)
            return (diff, opt_state, key), loss

        (diff, opt_state, key), losses = jax.lax.scan(
            body, (diff, opt_state, key), None, length=chunk_len
        )
        return diff, opt_state, key, losses[-1]

    key = jax.random.key(0)
    compiled = (
        jax.jit(chunk, donate_argnums=(0, 1)).lower(diff, opt_state, key).compile()
    )
    # FLOP accounting MUST come from a single-step executable: XLA's
    # cost_analysis() counts a lax.scan body ONCE regardless of trip count, so
    # reading the chunk executable's flops and dividing by chunk_len would
    # under-report per-step FLOPs by ~chunk_len x (regression test:
    # tests/test_profiling.py::test_scan_flops_counted_once).  We still TIME
    # the scanned chunk (one dispatch per chunk, immune to host latency).
    step_compiled = (
        jax.jit(step, donate_argnums=(0, 1))
        .lower(diff, opt_state, jax.random.key(1))
        .compile()
    )
    ca = executable_cost(step_compiled)
    flops_per_step = float(ca.get("flops", 0.0))

    # warmup
    diff, opt_state, key, loss = compiled(diff, opt_state, key)
    jax.block_until_ready(loss)

    # median of 3 repeats, one chunk per repeat: robust against transient
    # tunnel/chip stalls in either direction (one session produced a
    # physically impossible 61M samples/s single measurement — a dispatch
    # glitch — and occasional ~20%-slow outliers)
    chunks = 1
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(chunks):
            diff, opt_state, key, loss = compiled(diff, opt_state, key)
        jax.block_until_ready(loss)
        rates.append((time.perf_counter() - t0) / (chunks * chunk_len))
    dt = sorted(rates)[1]
    assert bool(jnp.isfinite(loss)), "non-finite loss in benchmark step"

    samples_per_sec = num_samples / dt
    peak = chip_peak_flops()
    mfu = flops_per_step / dt / peak
    print(
        json.dumps(
            {
                "metric": "nsf_cylinder_reverse_kld_train_samples_per_sec",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s/chip",
                "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 2),
                "mfu": round(mfu, 4) if mfu == mfu else None,
            }
        )
    )


if __name__ == "__main__":
    main()
