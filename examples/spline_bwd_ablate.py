"""Throwaway ablation: which part of the spline backward kernel costs?

Builds stripped variants of the backward pallas_call at flagship shapes:
  sel_only    selection recompute (collect=True) + dummy outputs
  sel_post    + jax.vjp of the post-selection math
  full        the real _spline_block_bwd
  full_xg     full math but only xg written (output-write cost test)
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

from normflows_tpu.ops import splines as ref
from normflows_tpu.ops import spline_pallas as sp
from normflows_tpu.utils import enable_compilation_cache

from flagship_decomposition import scan_time

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
            out = sp._selection(x, uw, uh, ud, codes, bound, collect=True, **cfg)
            xs, inside, is_circ, is_lin, sel, (hits, belows, pw, ph) = out
            acc = xs
            for h in hits:
                acc = acc + h.astype(x.dtype)
            xg_ref[:] = acc + sum(sel) + pw[0] + ph[0]
            uwg_ref[:] = uw
            uhg_ref[:] = uh
            udg_ref[:] = ud
        elif mode == "sel_post":
            out = sp._selection(x, uw, uh, ud, codes, bound, collect=True, **cfg)
            xs, inside, is_circ, is_lin, sel, (hits, belows, pw, ph) = out
            _, vjp_fn = jax.vjp(
                lambda xs_, cw, w, ch, h, dk, dk1: sp._post_math(
                    xs_, cw, w, ch, h, dk, dk1, inverse=True), xs, *sel)
            dxs, dcw, dw, dch, dh, ddk, ddk1 = vjp_fn((ybar, lbar))
            acc = dxs + dcw + dw + dch + dh + ddk + ddk1
            for h in hits:
                acc = acc + h.astype(x.dtype)
            xg_ref[:] = acc + pw[0] + ph[0]
            uwg_ref[:] = uw
            uhg_ref[:] = uh
            udg_ref[:] = ud
        else:  # full / full_xg
            xg, uwg, uhg, udg = sp._spline_block_bwd(
                x, uw, uh, ud, codes, bound, ybar, lbar, **cfg)
            if mode == "full_xg":
                xg_ref[:] = xg + uwg[0] + uhg[0] + udg[0]
                uwg_ref[:] = uw
                uhg_ref[:] = uh
                udg_ref[:] = ud
            else:
                xg_ref[:] = xg
                uwg_ref[:] = uwg
                uhg_ref[:] = uhg
                udg_ref[:] = udg
    return kern


def run_variant(mode, sub=64):
    n = N * F
    rows = n // sp.LANE
    grid = rows // sub
    espec, pspec = sp._specs(K, sub)

    x = jax.random.normal(jax.random.key(0), (rows, sp.LANE))
    uw = jax.random.normal(jax.random.key(1), (K, rows, sp.LANE)) * 0.1
    uh = jax.random.normal(jax.random.key(2), (K, rows, sp.LANE)) * 0.1
    ud = jax.random.normal(jax.random.key(3), (K + 1, rows, sp.LANE)) * 0.1
    codes = jnp.full((rows, sp.LANE), ref.TAIL_CIRCULAR, jnp.int32)
    bound = jnp.full((rows, sp.LANE), np.pi, jnp.float32)
    ybar = jnp.ones((rows, sp.LANE))
    lbar = jnp.ones((rows, sp.LANE))

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
    )

    def body(c):
        xx, acc = c
        xg, uwg, uhg, udg = call(xx, uw, uh, ud, codes, bound, ybar, lbar)
        return xx + 1e-30 * xg, acc + jnp.sum(xg[0, :1])

    t = scan_time(body, (x, jnp.float32(0)), 60, 12)
    print(json.dumps({"mode": mode, "sub": sub, "ms": round(t * 1e3, 4)}),
          flush=True)


if __name__ == "__main__":
    enable_compilation_cache()
    for mode in ("sel_only", "sel_post", "full", "full_xg"):
        run_variant(mode)
    run_variant("full", sub=256)
