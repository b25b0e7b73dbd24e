"""Spline backward kernel ablation (round-4 diagnosis, kept reproducible).

Historical context: the ORIGINAL backward kernel (in-kernel jax.vjp of the
whole block) measured 0.19 ms at flagship shapes; ablations here showed the
selection sweep and post-math vjp were free and the cost sat in the
gradient scatter under Mosaic register pressure, which led to the
hand-written `_bwd_scatter` (now ~0.008 ms — the `full` variant below
measures the current kernel).  Variants:

  sel_only   selection recompute (collect=True) + passthrough outputs
  sel_post   + jax.vjp of the post-selection math
  full       the shipped _bwd_scatter kernel
  vjp_all    jax.vjp of the whole (current) _spline_block inside the kernel

All four now measure ~0.01 ms: the decisive change was restructuring the
block into a lean selection sweep + small post function with per-plane ref
stores — once that landed, even whole-block vjp compiles well.  The
original 0.19 ms baseline was the PRE-refactor monolithic block (with the
softmax-probability/below-mask lists captured as vjp residuals inside the
K-loop), preserved in git history at the parent of commit e03810e; this
script reproduces the shipped kernel's ~0.01 ms and the ablation
structure, not the deleted slow baseline.

Run:  env PYTHONPATH="/root/.axon_site:/root/repo:/root/repo/examples" \
          python examples/spline_bwd_ablate.py
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
import functools

from normflows_tpu.ops import splines as ref
from normflows_tpu.ops import spline_pallas as sp
from normflows_tpu.utils import enable_compilation_cache

from flagship_decomposition import scan_time

import argparse

N, F, K = 2**14, 2, 10
cfg = dict(num_bins=K, inverse=True,
           min_bin_width=ref.DEFAULT_MIN_BIN_WIDTH,
           min_bin_height=ref.DEFAULT_MIN_BIN_HEIGHT,
           min_derivative=ref.DEFAULT_MIN_DERIVATIVE)


def variant_kernel(mode):
    def kern(x_ref, uw_ref, uh_ref, ud_ref, code_ref, bound_ref, ybar_ref,
             lbar_ref, xg_ref, uwg_ref, uhg_ref, udg_ref):
        x, uw, uh, ud = x_ref[:], uw_ref[:], uh_ref[:], ud_ref[:]
        codes, bound = code_ref[:], bound_ref[:]
        ybar, lbar = ybar_ref[:], lbar_ref[:]
        if mode == "sel_only":
            xs, inside, is_circ, is_lin, sel, hits, stats = sp._selection(
                x, uw, uh, ud, codes, bound, collect=True, **cfg)
            acc = xs + sum(sel) + sum(stats)
            for h in hits:
                acc = acc + h.astype(x.dtype)
            xg_ref[:] = acc
            uwg_ref[:] = uw
            uhg_ref[:] = uh
            udg_ref[:] = ud
        elif mode == "sel_post":
            xs, inside, is_circ, is_lin, sel, hits, stats = sp._selection(
                x, uw, uh, ud, codes, bound, collect=True, **cfg)
            _, vjp_fn = jax.vjp(
                lambda xs_, cw, w, ch, h, dk, dk1: sp._post_math(
                    xs_, cw, w, ch, h, dk, dk1, inverse=True), xs, *sel)
            grads = vjp_fn((ybar, lbar))
            acc = sum(grads)
            for h in hits:
                acc = acc + h.astype(x.dtype)
            xg_ref[:] = acc
            uwg_ref[:] = uw
            uhg_ref[:] = uh
            udg_ref[:] = ud
        elif mode == "vjp_all":  # the original slow design, for comparison
            def f(x_, uw_, uh_, ud_):
                return sp._spline_block(x_, uw_, uh_, ud_, codes, bound, **cfg)

            _, vjp_fn = jax.vjp(f, x, [uw[k] for k in range(K)],
                                [uh[k] for k in range(K)],
                                [ud[k] for k in range(K + 1)])
            xg, uwg, uhg, udg = vjp_fn((ybar, lbar))
            xg_ref[:] = xg
            uwg_ref[:] = jnp.stack(uwg)
            uhg_ref[:] = jnp.stack(uhg)
            udg_ref[:] = jnp.stack(udg)
        else:  # full — the shipped hand-written scatter
            sp._bwd_scatter(
                x, [uw[k] for k in range(K)], [uh[k] for k in range(K)],
                [ud[k] for k in range(K + 1)], codes, bound, ybar, lbar,
                xg_ref, uwg_ref, uhg_ref, udg_ref, **cfg)
    return kern


def run_variant(mode, sub=64, n_samples=None, long_len=60, short_len=12,
                interpret=False):
    n = (n_samples if n_samples is not None else N) * F
    rows = n // sp.LANE
    sub = min(sub, rows)
    grid = rows // sub
    espec, pspec = sp._specs(K, sub)

    x = jax.random.normal(jax.random.key(0), (rows, sp.LANE))
    uw = jax.random.normal(jax.random.key(1), (K, rows, sp.LANE)) * 0.1
    uh = jax.random.normal(jax.random.key(2), (K, rows, sp.LANE)) * 0.1
    ud = jax.random.normal(jax.random.key(3), (K + 1, rows, sp.LANE)) * 0.1
    codes = jnp.full((rows, sp.LANE), ref.TAIL_CIRCULAR, jnp.int32)
    bound = jnp.full((rows, sp.LANE), np.pi, jnp.float32)
    ones = jnp.ones((rows, sp.LANE))

    call = pl.pallas_call(
        variant_kernel(mode),
        grid=(grid,),
        in_specs=[espec, pspec(K), pspec(K), pspec(K + 1), espec, espec,
                  espec, espec],
        out_specs=(espec, pspec(K), pspec(K), pspec(K + 1)),
        out_shape=(
            jax.ShapeDtypeStruct((rows, sp.LANE), jnp.float32),
            jax.ShapeDtypeStruct((K, rows, sp.LANE), jnp.float32),
            jax.ShapeDtypeStruct((K, rows, sp.LANE), jnp.float32),
            jax.ShapeDtypeStruct((K + 1, rows, sp.LANE), jnp.float32),
        ),
        interpret=interpret,
    )

    def body(c):
        xx, acc = c
        xg, uwg, uhg, udg = call(xx, uw, uh, ud, codes, bound, ones, ones)
        return xx + 1e-30 * xg, acc + jnp.sum(xg[0, :1]) + jnp.sum(uwg[0, 0, :1])

    t = scan_time(body, (x, jnp.float32(0)), long_len, short_len)
    print(json.dumps({"mode": mode, "sub": sub, "ms": round(t * 1e3, 4)}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test config (tiny n, 2-step scans, "
                         "interpret-mode kernels off-TPU)")
    args = ap.parse_args()
    enable_compilation_cache()
    interpret = jax.default_backend() != "tpu"
    if args.tiny:
        kw = dict(n_samples=2**9, long_len=2, short_len=1,
                  interpret=interpret)
    else:
        kw = dict(interpret=interpret)
    for mode in ("sel_only", "sel_post", "full", "vjp_all"):
        run_variant(mode, **kw)


if __name__ == "__main__":
    main()
