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


def _post_math(xs, in_cw, in_w, in_ch, in_h, in_dk, in_dk1, *, inverse):
    """Rational-quadratic evaluation given the SELECTED bin parameters.

    Small (~30-op) function of 7 block tensors — cheap to pull back with
    jax.vjp inside the hand-structured backward kernel."""
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
    return out, ld


def _selection(x, uw, uh, ud, codes, bound, *, num_bins, inverse,
               min_bin_width, min_bin_height, min_derivative, collect=False):
    """Shared K-step bin search + parameter gather.

    Returns ``(xs, inside, is_circ, is_lin, sel)`` where ``sel`` holds the
    selected (cw, w, ch, h, dk, dk1).  With ``collect=True`` the return is
    ``(xs, inside, is_circ, is_lin, sel, hits, stats)`` — the per-bin hit
    masks plus the softmax stats (wmax, wsum, hmax, hsum); the hand-written
    backward (_bwd_scatter) rebuilds below-masks and probabilities from
    these to keep the kernel's live state minimal."""
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
    hits = []

    for k in range(K):
        p_w = jnp.exp(uw[k] - wmax) / wsum
        p_h = jnp.exp(uh[k] - hmax) / hsum
        w_k = (min_bin_width + fw * p_w) * span
        h_k = (min_bin_height + fh * p_h) * span
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
        if collect:
            hits.append(hit)
        cw = cw_next
        ch = ch_next

    sel = (in_cw, in_w, in_ch, in_h, in_dk, in_dk1)
    if collect:
        stats = (wmax, wsum, hmax, hsum)
        return xs, inside, is_circ, is_lin, sel, hits, stats
    return xs, inside, is_circ, is_lin, sel


def _spline_block(x, uw, uh, ud, codes, bound, *, num_bins, inverse,
                  min_bin_width, min_bin_height, min_derivative):
    """Core spline math on one VMEM block.

    x/codes/bound: (8, 128); uw/uh: (K, 8, 128); ud: (K+1, 8, 128).
    Differentiable w.r.t. x, uw, uh, ud.  Mirrors ops/splines.py semantics.
    """
    xs, inside, is_circ, is_lin, sel = _selection(
        x, uw, uh, ud, codes, bound, num_bins=num_bins, inverse=inverse,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    out, ld = _post_math(xs, *sel, inverse=inverse)
    use_spline = inside | is_circ
    y = jnp.where(use_spline, out, x)
    logdet = jnp.where(use_spline, ld, jnp.zeros_like(x))
    return y, logdet


def _bwd_scatter(x, uw, uh, ud, codes, bound, ybar, lbar,
                 xg_ref, uwg_ref, uhg_ref, udg_ref, *, num_bins, inverse,
                 min_bin_width, min_bin_height, min_derivative):
    """Hand-structured backward writing gradient planes straight to refs.

    The naive in-kernel ``jax.vjp`` of the whole block was ~20x the forward
    cost (measured: 0.24 ms vs 0.011 ms at flagship shapes): differentiating
    through the K-step accumulate-and-select sweep makes Mosaic carry ~60
    live (sub, LANE) residual planes, which spill to VMEM around every op.
    Here the sweep is recomputed WITHOUT autodiff (keeping only the K hit
    masks live), only the ~30-op post-selection math is pulled back with
    jax.vjp, and the gradients scatter back through the selection structure
    analytically, one output plane at a time (direct ref stores, softmax
    probabilities recomputed per pass — exps are cheaper than spilled
    residuals):

      * cw/ch are prefix sums: d(w_k) += below_k * dcw  (+ hit_k * dw),
        with below_k = "bin k strictly below the selected bin" rebuilt as a
        running OR of the hit masks
      * softmax:  duw_k = p_k * (g_k - sum_j p_j g_j),  g_k = dw_k * fw * span
      * knot derivatives:  dud[j] gets  hit_j * ddk  (low knot of bin j) and
        hit_{j-1} * ddk1  (high knot), through softplus' sigmoid, with the
        reference's boundary/circular where-structure
        (ops/splines.py make_knot_derivatives).
    """
    K = num_bins
    span = 2.0 * bound
    fw = 1.0 - min_bin_width * K
    fh = 1.0 - min_bin_height * K

    xs, inside, is_circ, is_lin, sel, hits, stats = _selection(
        x, uw, uh, ud, codes, bound, num_bins=num_bins, inverse=inverse,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative, collect=True,
    )
    wmax, wsum, hmax, hsum = stats
    use_spline = inside | is_circ
    zero = jnp.zeros_like(x)
    yb = jnp.where(use_spline, ybar, zero)
    lb = jnp.where(use_spline, lbar, zero)

    _, vjp_fn = jax.vjp(
        lambda xs_, cw, w, ch, h, dk, dk1: _post_math(
            xs_, cw, w, ch, h, dk, dk1, inverse=inverse),
        xs, *sel,
    )
    dxs, dcw, dw, dch, dh, ddk, ddk1 = vjp_fn((yb, lb))

    # ---- x gradient -------------------------------------------------------
    # xs = where(is_circ, left + mod(x-left, span), clip(x, left, -left));
    # y = where(use_spline, out, x)
    pass_through = jnp.where(
        is_circ, jnp.ones_like(x), inside.astype(x.dtype))
    xg_ref[:] = dxs * pass_through + jnp.where(use_spline, zero, ybar)

    # ---- width / height logits via prefix-sum + softmax -------------------
    # w_k = (mbw + fw * p_k) * span; selected w = sum_k hit_k w_k;
    # cw = left + sum_{k<sel} w_k  ->  dw_k = hit_k*dw + below_k*dcw
    fsp_w = fw * span
    fsp_h = fh * span

    def pair(k, found):
        hit = hits[k].astype(x.dtype)
        below = jnp.logical_not(found | hits[k]).astype(x.dtype)
        gwk = (hit * dw + below * dcw) * fsp_w
        ghk = (hit * dh + below * dch) * fsp_h
        p_w = jnp.exp(uw[k] - wmax) / wsum
        p_h = jnp.exp(uh[k] - hmax) / hsum
        return p_w, p_h, gwk, ghk

    Sw = zero
    Sh = zero
    found = jnp.zeros_like(x, dtype=jnp.bool_)
    for k in range(K):
        p_w, p_h, gwk, ghk = pair(k, found)
        Sw = Sw + p_w * gwk
        Sh = Sh + p_h * ghk
        found = found | hits[k]
    found = jnp.zeros_like(x, dtype=jnp.bool_)
    for k in range(K):
        p_w, p_h, gwk, ghk = pair(k, found)
        uwg_ref[k] = p_w * (gwk - Sw)
        uhg_ref[k] = p_h * (ghk - Sh)
        found = found | hits[k]

    # ---- knot-derivative logits -------------------------------------------
    # deriv(0) = where(is_lin, 1, md + softplus(ud[0]))
    # deriv(k) = md + softplus(ud[k])                        0 < k < K
    # deriv(K) = where(is_lin, 1, where(is_circ, deriv0_raw, md+softplus(ud[K])))
    not_lin = jnp.logical_not(is_lin).astype(x.dtype)
    not_lin_not_circ = (jnp.logical_not(is_lin)
                        & jnp.logical_not(is_circ)).astype(x.dtype)
    circ_not_lin = (is_circ & jnp.logical_not(is_lin)).astype(x.dtype)
    for j in range(K + 1):
        g = zero
        if j < K:  # low knot of bin j
            g = g + hits[j].astype(x.dtype) * ddk * (not_lin if j == 0 else 1.0)
        if j >= 1:  # high knot of bin j-1
            g = g + (hits[j - 1].astype(x.dtype) * ddk1
                     * (not_lin_not_circ if j == K else 1.0))
        if j == 0:  # circular wrap: deriv(K) reuses the k=0 raw derivative
            g = g + hits[K - 1].astype(x.dtype) * ddk1 * circ_not_lin
        udg_ref[j] = g * jax.nn.sigmoid(ud[j])


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
    _bwd_scatter(
        x_ref[:], uw_ref[:], uh_ref[:], ud_ref[:], code_ref[:], bound_ref[:],
        ybar_ref[:], lbar_ref[:], xg_ref, uwg_ref, uhg_ref, udg_ref, **cfg,
    )


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


# ---------------------------------------------------------------------------
# Transposed (planar) path — zero-relayout pipeline with MADE.apply_t
# ---------------------------------------------------------------------------
#
# The standard entry point above takes params in the natural (..., S) layout
# and transposes them to planar (S, N) for the kernel; those XLA relayouts
# (minor dim ~10-31) measure ~30 us EACH at flagship shapes and dominate the
# AR layer's cost (docs/performance.md, flagship decomposition).  This path
# instead consumes the MADE output already transposed — params (P, B) with
# row p = f*S + s, exactly what MADE.apply_t produces — so every kernel
# input/output is a static row slice and the only layout ops left are the
# free thin (B, F) <-> (F, B) transposes at the layer boundary.

def _t_rows(p_ref, f, S, K):
    uw = [p_ref[f * S + k] for k in range(K)]
    uh = [p_ref[f * S + K + k] for k in range(K)]
    ud = [p_ref[f * S + 2 * K + k] for k in range(K + 1)]
    return uw, uh, ud


def _t_fwd_kernel(x_ref, p_ref, y_ref, ld_ref, *, F, codes, bounds, num_bins,
                  inverse, min_bin_width, min_bin_height, min_derivative):
    K = num_bins
    S = 3 * K + 1
    for f in range(F):
        x = x_ref[f]
        uw, uh, ud = _t_rows(p_ref, f, S, K)
        code = jnp.full(x.shape, codes[f], jnp.int32)
        bound = jnp.full(x.shape, bounds[f], x.dtype)
        y, ld = _spline_block(
            x, uw, uh, ud, code, bound, num_bins=K, inverse=inverse,
            min_bin_width=min_bin_width, min_bin_height=min_bin_height,
            min_derivative=min_derivative,
        )
        y_ref[f] = y
        ld_ref[f] = ld


class _RowSliceRef:
    """Adapter: plane stores offset into a larger leading-axis ref."""

    def __init__(self, ref, base):
        self._ref = ref
        self._base = base

    def __setitem__(self, k, v):
        if isinstance(k, slice):  # xg_ref[:] = v from _bwd_scatter
            self._ref[self._base] = v
        else:
            self._ref[self._base + k] = v


def _t_bwd_kernel(x_ref, p_ref, ybar_ref, lbar_ref, dx_ref, dp_ref, *, F,
                  codes, bounds, num_bins, inverse, min_bin_width,
                  min_bin_height, min_derivative):
    K = num_bins
    S = 3 * K + 1
    for f in range(F):
        x = x_ref[f]
        uw, uh, ud = _t_rows(p_ref, f, S, K)
        code = jnp.full(x.shape, codes[f], jnp.int32)
        bound = jnp.full(x.shape, bounds[f], x.dtype)
        _bwd_scatter(
            x, uw, uh, ud, code, bound, ybar_ref[f], lbar_ref[f],
            _RowSliceRef(dx_ref, f), _RowSliceRef(dp_ref, f * S),
            _RowSliceRef(dp_ref, f * S + K), _RowSliceRef(dp_ref, f * S + 2 * K),
            num_bins=K, inverse=inverse, min_bin_width=min_bin_width,
            min_bin_height=min_bin_height, min_derivative=min_derivative,
        )


def _t_blocks(x_t, params_t, sub):
    F, B = x_t.shape
    P = params_t.shape[0]
    pad = (-B) % (sub * LANE)
    if pad:
        x_t = jnp.pad(x_t, ((0, 0), (0, pad)))
        params_t = jnp.pad(params_t, ((0, 0), (0, pad)))
    rows = (B + pad) // LANE
    return (x_t.reshape(F, rows, LANE), params_t.reshape(P, rows, LANE),
            rows, pad)


def _dyn_pad(x, uw_t, uh_t, ud_t, codes, bounds, sub):
    n = x.shape[0]
    pad = (-n) % (sub * LANE)
    if pad:
        x = jnp.pad(x, (0, pad))
        uw_t = jnp.pad(uw_t, ((0, 0), (0, pad)))
        uh_t = jnp.pad(uh_t, ((0, 0), (0, pad)))
        ud_t = jnp.pad(ud_t, ((0, 0), (0, pad)))
        codes = jnp.pad(codes, (0, pad), constant_values=ref.TAIL_LINEAR)
        bounds = jnp.pad(bounds, (0, pad), constant_values=1.0)
    return x, uw_t, uh_t, ud_t, codes, bounds, n, pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def unconstrained_rqs_pallas_dyncodes(
    x, uw_t, uh_t, ud_t, codes, bounds, inverse,
    min_bin_width=ref.DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=ref.DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=ref.DEFAULT_MIN_DERIVATIVE,
    interpret=False,
):
    """Flat-layout Pallas spline with TRACED per-element codes/bounds.

    Unlike :func:`unconstrained_rational_quadratic_spline_pallas` (static
    tail tuples baked at trace time), ``codes`` (int32, (N,)) and ``bounds``
    (float, (N,)) are ordinary array operands — usable when the tail
    selection is data-dependent, e.g. the sliced sequential AR inverse where
    the active feature index is a loop variable.  Params are pre-transposed:
    ``uw_t``/``uh_t`` (K, N), ``ud_t`` (K+1, N); returns ``(y (N,), ld (N,))``.
    """
    y, ld = _dyn_fwd(x, uw_t, uh_t, ud_t, codes, bounds, inverse,
                     min_bin_width, min_bin_height, min_derivative, interpret)
    return y, ld


def _dyn_cfg(uw_t, inverse, mbw, mbh, md):
    return dict(num_bins=uw_t.shape[0], inverse=inverse, min_bin_width=mbw,
                min_bin_height=mbh, min_derivative=md)


def _dyn_fwd(x, uw_t, uh_t, ud_t, codes, bounds, inverse, mbw, mbh, md,
             interpret):
    sub = _pick_sub(x.shape[0])
    cfg = _dyn_cfg(uw_t, inverse, mbw, mbh, md)
    x_p, uw_p, uh_p, ud_p, c_p, b_p, n, pad = _dyn_pad(
        x, uw_t, uh_t, ud_t, codes.astype(jnp.int32), bounds.astype(x.dtype),
        sub)
    y, ld = _pallas_fwd_flat(x_p, uw_p, uh_p, ud_p, c_p, b_p, cfg, interpret,
                             sub)
    if pad:
        y, ld = y[:n], ld[:n]
    return y, ld


def _dyn_vjp_fwd(x, uw_t, uh_t, ud_t, codes, bounds, inverse, mbw, mbh, md,
                 interpret):
    out = _dyn_fwd(x, uw_t, uh_t, ud_t, codes, bounds, inverse, mbw, mbh, md,
                   interpret)
    return out, (x, uw_t, uh_t, ud_t, codes, bounds)


def _dyn_vjp_bwd(inverse, mbw, mbh, md, interpret, res, cts):
    x, uw_t, uh_t, ud_t, codes, bounds = res
    ybar, lbar = cts
    sub = _pick_sub(x.shape[0])
    cfg = _dyn_cfg(uw_t, inverse, mbw, mbh, md)
    x_p, uw_p, uh_p, ud_p, c_p, b_p, n, pad = _dyn_pad(
        x, uw_t, uh_t, ud_t, codes.astype(jnp.int32), bounds.astype(x.dtype),
        sub)
    yb = jnp.asarray(ybar, x.dtype)
    lb = jnp.asarray(lbar, x.dtype)
    if pad:
        yb = jnp.pad(yb, (0, pad))
        lb = jnp.pad(lb, (0, pad))
    xg, uwg, uhg, udg = _pallas_bwd_flat(
        x_p, uw_p, uh_p, ud_p, c_p, b_p, yb, lb, cfg, interpret, sub)
    if pad:
        xg = xg[:n]
        uwg, uhg, udg = uwg[:, :n], uhg[:, :n], udg[:, :n]
    # codes (int) take a float0 tangent; bounds are treated as non-trained
    # selection data (matching the static-tuple API where they are nondiff)
    codes_g = np.zeros(codes.shape, jax.dtypes.float0)
    return xg, uwg, uhg, udg, codes_g, jnp.zeros_like(bounds)


unconstrained_rqs_pallas_dyncodes.defvjp(_dyn_vjp_fwd, _dyn_vjp_bwd)


def _t_spec(planes, sub):
    return pl.BlockSpec((planes, sub, LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def _t_cfg(F, P, tail_codes, tail_bound, inverse, mbw, mbh, md):
    K = (P // F - 1) // 3
    return dict(
        F=F, codes=tuple(int(c) for c in tail_codes),
        bounds=tuple(float(b) for b in tail_bound), num_bins=K,
        inverse=inverse, min_bin_width=mbw, min_bin_height=mbh,
        min_derivative=md,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def rqs_transposed_pallas(x_t, params_t, tail_codes, tail_bound, inverse,
                          min_bin_width=ref.DEFAULT_MIN_BIN_WIDTH,
                          min_bin_height=ref.DEFAULT_MIN_BIN_HEIGHT,
                          min_derivative=ref.DEFAULT_MIN_DERIVATIVE,
                          interpret=False):
    """Planar RQS: x_t (F, B), params_t (P, B) -> (y_t (F, B), ld_t (F, B)).

    ``tail_codes``/``tail_bound`` are static per-feature tuples; params rows
    follow the reference layout p = f*(3K+1) + s (uw | uh | ud per feature).
    """
    return _t_fwd_impl(x_t, params_t, tail_codes, tail_bound, inverse,
                       min_bin_width, min_bin_height, min_derivative,
                       interpret)


def _t_fwd_impl(x_t, params_t, tail_codes, tail_bound, inverse, mbw, mbh, md,
                interpret):
    F, B = x_t.shape
    P = params_t.shape[0]
    sub = _pick_sub(B)
    cfg = _t_cfg(F, P, tail_codes, tail_bound, inverse, mbw, mbh, md)
    x3, p3, rows, pad = _t_blocks(x_t, params_t, sub)
    kernel = functools.partial(_t_fwd_kernel, **cfg)
    y3, ld3 = pl.pallas_call(
        kernel,
        grid=(rows // sub,),
        in_specs=[_t_spec(F, sub), _t_spec(P, sub)],
        out_specs=(_t_spec(F, sub), _t_spec(F, sub)),
        out_shape=(
            jax.ShapeDtypeStruct((F, rows, LANE), x_t.dtype),
            jax.ShapeDtypeStruct((F, rows, LANE), x_t.dtype),
        ),
        interpret=interpret,
    )(x3, p3)
    y = y3.reshape(F, -1)
    ld = ld3.reshape(F, -1)
    if pad:
        y, ld = y[:, :B], ld[:, :B]
    return y, ld


def _t_vjp_fwd(x_t, params_t, tail_codes, tail_bound, inverse, mbw, mbh, md,
               interpret):
    out = _t_fwd_impl(x_t, params_t, tail_codes, tail_bound, inverse, mbw,
                      mbh, md, interpret)
    return out, (x_t, params_t)


def _t_vjp_bwd(tail_codes, tail_bound, inverse, mbw, mbh, md, interpret,
               res, cts):
    x_t, params_t = res
    ybar, lbar = cts
    F, B = x_t.shape
    P = params_t.shape[0]
    sub = _pick_sub(B)
    cfg = _t_cfg(F, P, tail_codes, tail_bound, inverse, mbw, mbh, md)
    x3, p3, rows, pad = _t_blocks(x_t, params_t, sub)
    yb3, lb3, _, _ = _t_blocks(jnp.asarray(ybar, x_t.dtype),
                               jnp.asarray(lbar, x_t.dtype), sub)
    kernel = functools.partial(_t_bwd_kernel, **cfg)
    dx3, dp3 = pl.pallas_call(
        kernel,
        grid=(rows // sub,),
        in_specs=[_t_spec(F, sub), _t_spec(P, sub), _t_spec(F, sub),
                  _t_spec(F, sub)],
        out_specs=(_t_spec(F, sub), _t_spec(P, sub)),
        out_shape=(
            jax.ShapeDtypeStruct((F, rows, LANE), x_t.dtype),
            jax.ShapeDtypeStruct((P, rows, LANE), x_t.dtype),
        ),
        interpret=interpret,
    )(x3, p3, yb3, lb3)
    dx = dx3.reshape(F, -1)
    dp = dp3.reshape(P, -1)
    if pad:
        dx, dp = dx[:, :B], dp[:, :B]
    return dx, dp


rqs_transposed_pallas.defvjp(_t_vjp_fwd, _t_vjp_bwd)
