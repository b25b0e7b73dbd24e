"""Scaling-efficiency benchmark: flagship-step samples/s at 1..N devices.

The BASELINE.json north star asks for samples/s at 1 chip / 1 host / >=2 hosts
with >=85% weak-scaling efficiency.  This harness measures the full jitted
reverse-KLD training step (sample + loss + grad + optimizer update) of the
flagship NSF-cylinder model (examples/paper_example_nsf.ipynb config, reduced
via flags) data-parallel over a ``{data: n}`` mesh, with a FIXED per-device
sample count (weak scaling: the collective cost — one gradient allreduce over
ICI — is the only thing that grows with n).

Efficiency at n devices = rate_n / (n * rate_1).

Prints one JSON line per mesh point, e.g.::

    {"metric": "scaling_samples_per_sec", "devices": 4, "value": ...,
     "per_device": ..., "efficiency": 0.97, ...}

Usage:

* real TPU pod / multi-host (run once per process, standard JAX multi-host):

    python bench_scaling.py --devices 1,4,8 [--distributed]

* plumbing validation on virtual CPU devices (numbers are correctness-only —
  host CPUs share memory bandwidth, so "efficiency" is meaningless):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python bench_scaling.py --devices 1,2,4,8 --samples-per-device 512 \
        --layers 2 --hidden 64 --iters 5
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions, parallel
from normflows_tpu.utils import enable_compilation_cache


def build_model(num_layers: int, hidden: int):
    """Flagship circular-NSF model (see bench.py / BASELINE.md row 2)."""
    base = distributions.UniformGaussian.create(2, [1], jnp.array([1.0, 2 * np.pi]))
    layers = [
        flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.key(i), 2, 1, hidden, ind_circ=[1], num_bins=10,
            tail_bound=jnp.array([5.0, np.pi]), permute_mask=True, rng_seed=i,
        )
        for i in range(num_layers)
    ]
    return nf.NormalizingFlow.create(base, layers, p=distributions.GaussianVonMises())


def measure_point(model, n_devices: int, samples_per_device: int, iters: int,
                  warmup: int = 3) -> float:
    """samples/s of the data-parallel reverse-KLD step on the first n devices."""
    # fresh leaf copies: the jitted step donates its inputs, and device_put
    # onto an identical sharding is a no-op, so without a copy the donation
    # would delete the caller's model arrays between mesh points
    model = jax.tree.map(jnp.copy, model)
    devices = jax.devices()[:n_devices]
    mesh = parallel.make_mesh({"data": n_devices}, devices=devices)
    num_samples = samples_per_device * n_devices
    opt = optax.adam(5e-4)

    step_fn, diff, rest, opt_state = parallel.make_reverse_kld_step(
        model, opt, mesh, num_samples
    )

    # Scan `iters` steps inside ONE dispatch: pipelined per-call dispatch
    # still pays ~1.2 ms/call through the device tunnel (measured 2026-08-22
    # — 2.29M vs 2.77M samples/s on the identical single-chip step), so the
    # per-call loop under-reports the step.  The inner jitted step_fn
    # inlines into the scan body; its out_shardings survive as constraints.
    def chunk(diff, opt_state, key):
        def body(carry, _):
            diff, opt_state, key = carry
            key, sub = jax.random.split(key)
            diff, opt_state, loss = step_fn(diff, opt_state, sub)
            return (diff, opt_state, key), loss

        (diff, opt_state, key), losses = jax.lax.scan(
            body, (diff, opt_state, key), None, length=iters)
        return diff, opt_state, key, losses[-1]

    chunked = jax.jit(chunk, donate_argnums=(0, 1))
    key = jax.random.key(0)
    for _ in range(max(warmup // 2, 1)):  # compile + warm (a chunk is `iters` steps)
        diff, opt_state, key, loss = chunked(diff, opt_state, key)
    jax.block_until_ready(loss)

    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        diff, opt_state, key, loss = chunked(diff, opt_state, key)
        jax.block_until_ready(loss)
        rates.append((time.perf_counter() - t0) / iters)
    dt = sorted(rates)[1]
    assert bool(jnp.isfinite(loss)), f"non-finite loss at n={n_devices}"
    return num_samples / dt


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", default=None,
                    help="comma list of device counts (default: 1,2,4,...,N)")
    ap.add_argument("--samples-per-device", type=int, default=2**14)
    ap.add_argument("--iters", type=int, default=100)  # steps per timed dispatch; 100 amortizes the ~29 ms sync RTT <1%
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize() first (multi-host)")
    ap.add_argument("--coordinator", default=None,
                    help="explicit coordinator address host:port (multi-process "
                         "CPU clusters; TPU pods auto-detect)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.distributed or args.coordinator:
        from normflows_tpu.parallel import initialize_distributed
        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)

    enable_compilation_cache()
    n_avail = len(jax.devices())
    if args.devices:
        counts = [int(c) for c in args.devices.split(",")]
    else:
        counts = [2**i for i in range(0, n_avail.bit_length()) if 2**i <= n_avail]

    model = build_model(args.layers, args.hidden)
    if args.bf16:
        model = nf.utils.set_compute_dtype(model, "bfloat16")

    rate_1 = None
    for n in counts:
        if n > n_avail:
            print(json.dumps({"metric": "scaling_samples_per_sec", "devices": n,
                              "skipped": f"only {n_avail} devices"}))
            continue
        if jax.process_count() > 1 and n < n_avail:
            # A sub-global mesh would contain devices only some processes can
            # address while every process executes the step — an error (or
            # hang).  Multi-process sweeps measure per-point by varying the
            # process count per invocation instead.
            if jax.process_index() == 0:
                print(json.dumps({
                    "metric": "scaling_samples_per_sec", "devices": n,
                    "skipped": "multi-process run: only the global device "
                               "count is measurable per invocation"}))
            continue
        rate = measure_point(model, n, args.samples_per_device, args.iters)
        if rate_1 is None or n == 1:
            rate_1 = rate if n == 1 else rate / n  # fall back if 1 not measured
        eff = rate / (n * rate_1)
        if jax.process_index() != 0:
            continue
        print(json.dumps({
            "metric": "scaling_samples_per_sec",
            "devices": n,
            "hosts": jax.process_count(),
            "value": round(rate, 1),
            "unit": "samples/s",
            "per_device": round(rate / n, 1),
            "efficiency": round(eff, 4),
            "samples_per_device": args.samples_per_device,
            "platform": jax.devices()[0].platform,
        }))


if __name__ == "__main__":
    main()
