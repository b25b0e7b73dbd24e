"""Micro-probe: spline forward/backward cost, Pallas vs plain-XLA (jnp).

flagship_backward_probe.py attributed ~5.7 ms of the flagship step to the 24
spline backward calls (~0.24 ms each vs 0.011 ms forward).  The Pallas
backward recomputes the K-loop under jax.vjp INSIDE the kernel; this probe
asks whether XLA's fused backward of the dense jnp reference implementation
is cheaper at the exact flagship shapes (2^14 x 2 elements, K=10, mixed
linear/circular tails).

Run:  env PYTHONPATH="/root/.axon_site:/root/repo" python examples/spline_bwd_probe.py
"""

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

from normflows_tpu.ops import splines as ref
from normflows_tpu.ops.spline_pallas import (
    unconstrained_rational_quadratic_spline_pallas as pallas_spline,
)
from normflows_tpu.utils import enable_compilation_cache

from flagship_decomposition import scan_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--long", type=int, default=60)
    ap.add_argument("--short", type=int, default=12)
    ap.add_argument("--n", type=int, default=2**14)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test config (tiny n, 2-step scans)")
    args = ap.parse_args()
    enable_compilation_cache()
    if args.tiny:
        args.n, args.long, args.short = 2**9, 2, 1
    # the Pallas kernel only compiles on TPU; elsewhere run it interpreted
    interpret = jax.default_backend() != "tpu"

    N, F, K = args.n, 2, 10
    tail_codes = (ref.TAIL_LINEAR, ref.TAIL_CIRCULAR)
    tail_bound = (5.0, float(np.pi))
    x0 = jax.random.normal(jax.random.key(0), (N, F))
    uw = jax.random.normal(jax.random.key(1), (N, F, K)) * 0.1
    uh = jax.random.normal(jax.random.key(2), (N, F, K)) * 0.1
    ud = jax.random.normal(jax.random.key(3), (N, F, K + 1)) * 0.1

    codes_arr = jnp.broadcast_to(jnp.asarray(tail_codes, jnp.int32), (N, F))
    bound_arr = jnp.broadcast_to(jnp.asarray(tail_bound, jnp.float32), (N, F))

    def pallas_fn(x, uw, uh, ud, inverse):
        return pallas_spline(x, uw, uh, ud, tail_codes, tail_bound,
                             inverse, ref.DEFAULT_MIN_BIN_WIDTH,
                             ref.DEFAULT_MIN_BIN_HEIGHT,
                             ref.DEFAULT_MIN_DERIVATIVE, interpret, -1)

    def jnp_fn(x, uw, uh, ud, inverse):
        return ref.unconstrained_rational_quadratic_spline(
            x, uw, uh, ud, inverse=inverse,
            tail_codes=codes_arr, tail_bound=bound_arr)

    for name, fn in (("pallas", pallas_fn), ("jnp", jnp_fn)):
        for inverse in (True, False):
            def fwd_body(c):
                x, acc = c
                y, ld = fn(x, uw, uh, ud, inverse)
                return jnp.clip(y, -3.0, 3.0), acc + jnp.mean(ld)

            t_f = scan_time(fwd_body, (x0, jnp.float32(0)),
                            args.long, args.short)

            def grad_body(c):
                prm, x = c

                def f(p, xx):
                    y, ld = fn(xx, p[0], p[1], p[2], inverse)
                    return jnp.mean(ld) + jnp.mean(y)

                gp, gx = jax.grad(f, argnums=(0, 1))((prm[0], prm[1], prm[2]), x)
                new_p = jax.tree.map(lambda a, b: a + 1e-30 * b,
                                     (prm[0], prm[1], prm[2]), gp)
                return new_p, x + 1e-30 * gx

            t_g = scan_time(grad_body, ((uw, uh, ud), x0),
                            args.long, args.short)
            print(json.dumps({
                "impl": name, "inverse": inverse,
                "fwd_ms": round(t_f * 1e3, 4),
                "fwd_plus_bwd_ms": round(t_g * 1e3, 4),
                "bwd_over_fwd": round(t_g / max(t_f, 1e-9), 1),
            }), flush=True)


if __name__ == "__main__":
    main()
