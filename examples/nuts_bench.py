"""NUTS throughput + ESS/s on the cylinder target (1 chip).

Companion to the HAIS ladder datapoint in docs/sampling.md: measures the
iterative multinomial NUTS (vmapped while-loop tree building, all chains in
lockstep) on the flagship GaussianVonMises cylinder target.

Methodology (axon rules, docs/performance.md): the whole run — warmup +
sampling scan — compiles into ONE program; two runs differing only in
num_steps are differenced to cancel dispatch latency AND the shared warmup
cost, giving seconds per sampling transition.  ESS is Geyer
initial-positive-sequence per chain/dim on the longer run (the circular
coordinate is embedded as cos/sin before ESS).

Run:  env PYTHONPATH="/root/.axon_site:/root/repo" python examples/nuts_bench.py
Tiny CPU check: ... --tiny
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from normflows_tpu import distributions
from normflows_tpu.sampling import NUTS
from normflows_tpu.utils import enable_compilation_cache


def ess_1d(x):
    """Geyer initial-positive-sequence ESS for one chain (1-D numpy)."""
    n = len(x)
    x = x - x.mean()
    acov = np.correlate(x, x, mode="full")[n - 1 :] / n
    if acov[0] == 0:
        return float(n)
    rho = acov / acov[0]
    # sum of adjacent pairs must stay positive (initial positive sequence)
    pair = rho[1:-1:2] + rho[2::2]
    k = np.argmax(pair <= 0) if np.any(pair <= 0) else len(pair)
    tau = 1.0 + 2.0 * rho[1 : 1 + 2 * k].sum()
    return float(n / max(tau, 1e-9))


def total_ess(samples):
    """Sum ESS over chains for each embedded coordinate; return the minimum
    across coordinates (the conservative choice).  samples: (S, C, dim)."""
    s = np.asarray(samples, np.float64)
    coords = [s[..., 0], np.cos(s[..., 1]), np.sin(s[..., 1])]
    per_coord = []
    for c in coords:
        per_coord.append(sum(ess_1d(c[:, j]) for j in range(c.shape[1])))
    return min(per_coord)


def timed_run(nuts, chains, steps, adapt, key):
    fn = jax.jit(lambda k: nuts.sample(
        k, num_chains=chains, num_steps=steps, num_adapt=adapt))
    samples, info = fn(key)
    float(jnp.sum(samples[-1]))  # force
    t0 = time.perf_counter()
    samples, info = fn(key)
    float(jnp.sum(samples[-1]))
    return time.perf_counter() - t0, samples, info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--chains", type=int, default=None)
    args = ap.parse_args()
    enable_compilation_cache()

    target = distributions.GaussianVonMises()
    for chains in ([64] if args.tiny else [int(c) for c in
                   ([args.chains] if args.chains else [1024, 4096])]):
        short, long_, adapt = (8, 24, 8) if args.tiny else (64, 256, 200)
        nuts = NUTS.create(target, 2, step_size=0.2,
                           max_depth=6 if args.tiny else 8)
        t_short, _, _ = timed_run(nuts, chains, short, adapt, jax.random.key(0))
        t_long, samples, info = timed_run(
            nuts, chains, long_, adapt, jax.random.key(0))
        per_step = (t_long - t_short) / (long_ - short)
        ess = total_ess(samples)
        print(json.dumps({
            "sampler": "NUTS",
            "target": "GaussianVonMises cylinder",
            "chains": chains,
            "steps_timed": long_,
            "ms_per_transition_all_chains": round(per_step * 1e3, 3),
            "chain_transitions_per_sec": round(chains / per_step, 0),
            "min_total_ess": round(ess, 0),
            "ess_per_sec": round(ess / (per_step * long_), 0),
            "divergence_rate": round(float(info["divergence_rate"]), 5),
            "tuned_step_size": round(float(info["step_size"]), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
