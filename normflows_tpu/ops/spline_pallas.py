"""Fused Pallas TPU kernels for the rational-quadratic spline transform.

One kernel evaluates the full unconstrained RQ spline — softmax bin
normalization, bin search, rational-quadratic forward/inverse, log-det —
per element, reading the raw parameters exactly once from HBM into VMEM tiles.
The pure-jnp implementation in ops/splines.py is the semantic reference; the
kernels are validated against it to ~1e-4 (tests/test_pallas.py).

Layout: elements are flattened to N = prod(batch/event dims) and tiled as
(8, 128) VPU blocks; parameters are transposed to (slot, N) so each block is
(slots, 8, 128) with the 128-lane axis last (TPU tiling constraint).  The
K-bin search is a static K-step accumulate-and-select loop — no gather, no
searchsorted.

Autodiff: the backward pass is ALSO a fused Pallas kernel — the block-local
spline math is pulled back with ``jax.vjp`` *inside* the kernel body (traced
at kernel-trace time, so Mosaic sees plain vector ops), yielding analytic
gradients w.r.t. x and all raw parameters with zero extra HBM traffic.
Measured ~7x faster than the XLA-fused jnp path on v5e at flagship shapes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import splines as ref

SUB, LANE = 8, 128
TILE = SUB * LANE
MAX_SUB = 64  # sublane rows per grid step at large N (8 at small N)


def _pick_sub(n: int) -> int:
    """Sublane block height: large blocks amortize per-grid-step overhead.

    At flagship shapes (N = 2^14 x 2 elements) an (8, 128) block means 32
    grid steps whose DMA/semaphore overhead dominates the ~4 MB of actual
    traffic; (64, 128) blocks cut that to 4 steps.  Small inputs stay at 8
    rows so padding waste is bounded.
    """
    return MAX_SUB if n >= MAX_SUB * LANE else SUB


def _spline_block(x, uw, uh, ud, codes, bound, *, num_bins, inverse,
                  min_bin_width, min_bin_height, min_derivative):
    """Core spline math on one VMEM block.

    x/codes/bound: (8, 128); uw/uh: (K, 8, 128); ud: (K+1, 8, 128).
    Differentiable w.r.t. x, uw, uh, ud (used under jax.vjp in the backward
    kernel).  Mirrors ops/splines.py semantics.
    """
    K = num_bins
    left = -bound
    span = 2.0 * bound

    is_circ = codes == ref.TAIL_CIRCULAR
    is_lin = codes == ref.TAIL_LINEAR
    inside = (x >= left) & (x <= -left)
    wrapped = left + jnp.mod(x - left, span)
    xs = jnp.where(is_circ, wrapped, jnp.clip(x, left, -left))

    # softmax over the K width/height slots (two passes: max, sum)
    wmax = jax.lax.stop_gradient(uw[0])
    hmax = jax.lax.stop_gradient(uh[0])
    for k in range(1, K):
        wmax = jnp.maximum(wmax, jax.lax.stop_gradient(uw[k]))
        hmax = jnp.maximum(hmax, jax.lax.stop_gradient(uh[k]))
    wsum = jnp.zeros_like(x)
    hsum = jnp.zeros_like(x)
    for k in range(K):
        wsum = wsum + jnp.exp(uw[k] - wmax)
        hsum = hsum + jnp.exp(uh[k] - hmax)

    fw = 1.0 - min_bin_width * K
    fh = 1.0 - min_bin_height * K

    d0_raw = min_derivative + jax.nn.softplus(ud[0])
    one = jnp.ones_like(x)

    def deriv(k):
        raw = min_derivative + jax.nn.softplus(ud[k])
        if k == 0:
            return jnp.where(is_lin, one, raw)
        if k == K:
            return jnp.where(is_lin, one, jnp.where(is_circ, d0_raw, raw))
        return raw

    # K-step accumulate-and-select bin search + parameter gather
    cw = left
    ch = left
    found = jnp.zeros_like(x, dtype=jnp.bool_)
    in_cw = jnp.zeros_like(x)
    in_w = jnp.ones_like(x)
    in_ch = jnp.zeros_like(x)
    in_h = jnp.ones_like(x)
    in_dk = jnp.ones_like(x)
    in_dk1 = jnp.ones_like(x)

    for k in range(K):
        w_k = (min_bin_width + fw * jnp.exp(uw[k] - wmax) / wsum) * span
        h_k = (min_bin_height + fh * jnp.exp(uh[k] - hmax) / hsum) * span
        cw_next = cw + w_k
        ch_next = ch + h_k
        cond = xs < (ch_next if inverse else cw_next)
        if k == K - 1:  # final bin catches boundary/fp-drift elements
            cond = jnp.ones_like(cond)
        hit = jnp.logical_and(jnp.logical_not(found), cond)
        d_k = deriv(k)
        d_k1 = deriv(k + 1)
        in_cw = jnp.where(hit, cw, in_cw)
        in_w = jnp.where(hit, w_k, in_w)
        in_ch = jnp.where(hit, ch, in_ch)
        in_h = jnp.where(hit, h_k, in_h)
        in_dk = jnp.where(hit, d_k, in_dk)
        in_dk1 = jnp.where(hit, d_k1, in_dk1)
        found = found | hit
        cw = cw_next
        ch = ch_next

    delta = in_h / in_w
    s = in_dk + in_dk1 - 2.0 * delta

    if inverse:
        y_rel = xs - in_ch
        a = in_h * (delta - in_dk) + y_rel * s
        b = in_h * in_dk - y_rel * s
        c = -delta * y_rel
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        denom_root = -b - jnp.sqrt(disc)
        theta = (2.0 * c) / jnp.where(denom_root == 0.0, 1e-38, denom_root)
        theta = jnp.clip(theta, 0.0, 1.0)
        out = theta * in_w + in_cw
        om = 1.0 - theta
        tom = theta * om
        denom = delta + s * tom
        dnum = (delta * delta) * (
            in_dk1 * theta * theta + 2.0 * delta * tom + in_dk * om * om
        )
        ld = -(jnp.log(dnum) - 2.0 * jnp.log(denom))
    else:
        theta = jnp.clip((xs - in_cw) / in_w, 0.0, 1.0)
        om = 1.0 - theta
        tom = theta * om
        num = in_h * (delta * theta * theta + in_dk * tom)
        denom = delta + s * tom
        out = in_ch + num / denom
        dnum = (delta * delta) * (
            in_dk1 * theta * theta + 2.0 * delta * tom + in_dk * om * om
        )
        ld = jnp.log(dnum) - 2.0 * jnp.log(denom)

    use_spline = inside | is_circ
    y = jnp.where(use_spline, out, x)
    logdet = jnp.where(use_spline, ld, jnp.zeros_like(x))
    return y, logdet


def _fwd_kernel(x_ref, uw_ref, uh_ref, ud_ref, code_ref, bound_ref, y_ref,
                ld_ref, **cfg):
    y, ld = _spline_block(
        x_ref[:], uw_ref[:], uh_ref[:], ud_ref[:], code_ref[:], bound_ref[:],
        **cfg,
    )
    y_ref[:] = y
    ld_ref[:] = ld


def _bwd_kernel(x_ref, uw_ref, uh_ref, ud_ref, code_ref, bound_ref, ybar_ref,
                lbar_ref, xg_ref, uwg_ref, uhg_ref, udg_ref, **cfg):
    def f(x, uw, uh, ud):
        return _spline_block(x, uw, uh, ud, code_ref[:], bound_ref[:], **cfg)

    _, vjp_fn = jax.vjp(f, x_ref[:], uw_ref[:], uh_ref[:], ud_ref[:])
    xg, uwg, uhg, udg = vjp_fn((ybar_ref[:], lbar_ref[:]))
    xg_ref[:] = xg
    uwg_ref[:] = uwg
    uhg_ref[:] = uhg
    udg_ref[:] = udg


def _specs(K, sub):
    espec = pl.BlockSpec((sub, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def pspec(slots):
        return pl.BlockSpec(
            (slots, sub, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    return espec, pspec


def _pallas_fwd_flat(x, uw_t, uh_t, ud_t, codes, bounds, cfg, interpret, sub):
    rows = x.shape[0] // LANE
    grid = rows // sub
    K = cfg["num_bins"]
    espec, pspec = _specs(K, sub)
    kernel = functools.partial(_fwd_kernel, **cfg)

    def r2(a):
        return a.reshape(-1, LANE)

    def r3(a):
        return a.reshape(a.shape[0], -1, LANE)

    y, ld = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[espec, pspec(K), pspec(K), pspec(K + 1), espec, espec],
        out_specs=(espec, espec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANE), x.dtype),
            jax.ShapeDtypeStruct((rows, LANE), x.dtype),
        ),
        interpret=interpret,
    )(r2(x), r3(uw_t), r3(uh_t), r3(ud_t), r2(codes), r2(bounds))
    return y.reshape(-1), ld.reshape(-1)


def _pallas_bwd_flat(x, uw_t, uh_t, ud_t, codes, bounds, ybar, lbar, cfg,
                     interpret, sub):
    rows = x.shape[0] // LANE
    grid = rows // sub
    K = cfg["num_bins"]
    espec, pspec = _specs(K, sub)
    kernel = functools.partial(_bwd_kernel, **cfg)

    def r2(a):
        return a.reshape(-1, LANE)

    def r3(a):
        return a.reshape(a.shape[0], -1, LANE)

    xg, uwg, uhg, udg = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[espec, pspec(K), pspec(K), pspec(K + 1), espec, espec,
                  espec, espec],
        out_specs=(espec, pspec(K), pspec(K), pspec(K + 1)),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANE), x.dtype),
            jax.ShapeDtypeStruct((K, rows, LANE), x.dtype),
            jax.ShapeDtypeStruct((K, rows, LANE), x.dtype),
            jax.ShapeDtypeStruct((K + 1, rows, LANE), x.dtype),
        ),
        interpret=interpret,
    )(r2(x), r3(uw_t), r3(uh_t), r3(ud_t), r2(codes), r2(bounds), r2(ybar),
      r2(lbar))
    return (
        xg.reshape(-1),
        uwg.reshape(K, -1),
        uhg.reshape(K, -1),
        udg.reshape(K + 1, -1),
    )


def _align(v, shape, event_axis):
    """Static scalar/tuple -> array broadcastable over ``shape`` with the
    per-dim axis aligned to ``event_axis`` (e.g. channel axis 1 for NCHW)."""
    arr = np.asarray(v)
    if arr.ndim == 0:
        return jnp.broadcast_to(jnp.asarray(arr), shape)
    ax = event_axis % len(shape)
    view = [1] * len(shape)
    view[ax] = arr.shape[0]
    return jnp.broadcast_to(jnp.asarray(arr).reshape(view), shape)


def _prepare(x, uw, uh, ud, tail_codes, tail_bound, event_axis=-1, sub=SUB):
    shape = x.shape
    n = int(np.prod(shape))
    pad = (-n) % (sub * LANE)
    codes = _align(tail_codes, shape, event_axis).reshape(-1)
    bounds = _align(np.asarray(tail_bound, np.float32), shape, event_axis)
    bounds = bounds.astype(x.dtype).reshape(-1)

    def flat_pad(a, fill=0.0):
        a = a.reshape(-1)
        return jnp.pad(a, (0, pad), constant_values=fill) if pad else a

    def param_pad(p):  # (..., S) -> (S, N_padded)
        s = p.shape[-1]
        p = p.reshape(-1, s).T
        return jnp.pad(p, ((0, 0), (0, pad))) if pad else p

    return (
        flat_pad(x),
        param_pad(uw),
        param_pad(uh),
        param_pad(ud),
        flat_pad(codes.astype(jnp.int32), fill=ref.TAIL_LINEAR),
        flat_pad(bounds, fill=1.0),
        n,
        pad,
    )


def _unflatten_params(g_t, orig_shape, n, pad):
    """(S, N_padded) grads back to (..., S)."""
    g = g_t[:, :n] if pad else g_t
    return jnp.moveaxis(g, 0, -1).reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def unconstrained_rational_quadratic_spline_pallas(
    x, uw, uh, ud, tail_codes=ref.TAIL_LINEAR, tail_bound=1.0,
    inverse=False, min_bin_width=ref.DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=ref.DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=ref.DEFAULT_MIN_DERIVATIVE,
    interpret=False,
    event_axis=-1,
):
    """Pallas-fused drop-in for ops.splines.unconstrained_rational_quadratic_spline.

    ``tail_codes``/``tail_bound`` must be static here (python scalars or
    tuples — hashable); per-dim values as tuples matching the last event dim.
    """
    y, ld, _ = _fwd_impl(x, uw, uh, ud, tail_codes, tail_bound, inverse,
                         min_bin_width, min_bin_height, min_derivative,
                         interpret, event_axis)
    return y, ld


def _cfg(uw, inverse, mbw, mbh, md):
    return dict(
        num_bins=uw.shape[-1], inverse=inverse, min_bin_width=mbw,
        min_bin_height=mbh, min_derivative=md,
    )


def _fwd_impl(x, uw, uh, ud, tail_codes, tail_bound, inverse, mbw, mbh, md,
              interpret, event_axis=-1):
    shape = x.shape
    cfg = _cfg(uw, inverse, mbw, mbh, md)
    sub = _pick_sub(int(np.prod(shape)))
    x_f, uw_t, uh_t, ud_t, codes_f, bounds_f, n, pad = _prepare(
        x, uw, uh, ud, tail_codes, tail_bound, event_axis, sub
    )
    y, ld = _pallas_fwd_flat(x_f, uw_t, uh_t, ud_t, codes_f, bounds_f, cfg,
                             interpret, sub)
    if pad:
        y, ld = y[:n], ld[:n]
    return y.reshape(shape), ld.reshape(shape), None


def _vjp_fwd(x, uw, uh, ud, tail_codes, tail_bound, inverse, mbw, mbh, md,
             interpret, event_axis):
    y, ld, _ = _fwd_impl(x, uw, uh, ud, tail_codes, tail_bound, inverse, mbw,
                         mbh, md, interpret, event_axis)
    return (y, ld), (x, uw, uh, ud)


def _vjp_bwd(tail_codes, tail_bound, inverse, mbw, mbh, md, interpret,
             event_axis, res, cts):
    x, uw, uh, ud = res
    ybar, lbar = cts
    shape = x.shape
    cfg = _cfg(uw, inverse, mbw, mbh, md)
    sub = _pick_sub(int(np.prod(shape)))
    x_f, uw_t, uh_t, ud_t, codes_f, bounds_f, n, pad = _prepare(
        x, uw, uh, ud, tail_codes, tail_bound, event_axis, sub
    )

    def flat_pad(a):
        a = a.reshape(-1)
        return jnp.pad(a, (0, pad)) if pad else a

    xg, uwg_t, uhg_t, udg_t = _pallas_bwd_flat(
        x_f, uw_t, uh_t, ud_t, codes_f, bounds_f, flat_pad(ybar),
        flat_pad(lbar), cfg, interpret, sub,
    )
    xg = (xg[:n] if pad else xg).reshape(shape)
    return (
        xg,
        _unflatten_params(uwg_t, uw.shape, n, pad),
        _unflatten_params(uhg_t, uh.shape, n, pad),
        _unflatten_params(udg_t, ud.shape, n, pad),
    )


unconstrained_rational_quadratic_spline_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def unconstrained_rqs_interpret(x, uw, uh, ud, tail_codes=ref.TAIL_LINEAR,
                                tail_bound=1.0, inverse=False,
                                min_bin_width=ref.DEFAULT_MIN_BIN_WIDTH,
                                min_bin_height=ref.DEFAULT_MIN_BIN_HEIGHT,
                                min_derivative=ref.DEFAULT_MIN_DERIVATIVE):
    """Interpreter-mode version for CPU testing."""
    if isinstance(tail_codes, np.ndarray):
        tail_codes = tuple(tail_codes.tolist())
    if isinstance(tail_bound, np.ndarray):
        tail_bound = tuple(tail_bound.tolist())
    return unconstrained_rational_quadratic_spline_pallas(
        x, uw, uh, ud, tail_codes, tail_bound, inverse, min_bin_width,
        min_bin_height, min_derivative, True,
    )
