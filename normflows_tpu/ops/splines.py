"""Monotonic rational-quadratic splines, dense TPU-friendly formulation.

Re-derivation of the reference spline kernel
(``/root/reference/normflows/utils/splines.py:16-219``, itself from Durkan et
al., Neural Spline Flows) with two TPU-first changes:

1. **No boolean-mask gather/scatter.** The reference computes the spline only on
   inside-interval elements via ``inputs[inside_mask]`` (splines.py:73-95) —
   dynamic shapes that XLA cannot compile.  Here the spline is evaluated densely
   on *clamped* inputs and combined with the identity tails via ``jnp.where``
   (clamping keeps the unselected branch finite so gradients stay NaN-free).

2. **Batched bin search without ``searchsorted``.** Bin locations differ per
   element (per-element spline parameters), so the lookup is a vectorized
   comparison-sum (splines.py:11-13 uses the same trick), which maps onto the
   VPU as K parallel compares — no sequential search.

Parameter layout (uniform, unlike the reference's ragged per-tail counts at
neural_spline/coupling.py:321-327): every dim takes ``3*num_bins + 1`` raw
parameters ``[widths (K) | heights (K) | derivatives (K+1)]``.  Tail handling
consumes them as needed: 'linear' uses K-1 interior derivatives with fixed
boundary slope 1; 'circular' uses K derivatives with the periodic closure
``d[K] = d[0]``; ``None`` (constrained) uses all K+1.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3

# Tail modes (static ints so per-dim arrays of modes stay hashable/jit-static).
TAIL_NONE = 0
TAIL_LINEAR = 1
TAIL_CIRCULAR = 2

_TAIL_CODES = {None: TAIL_NONE, "linear": TAIL_LINEAR, "circular": TAIL_CIRCULAR}


def tail_code(tail) -> int:
    if isinstance(tail, (int, np.integer)):
        return int(tail)
    return _TAIL_CODES[tail]


def searchsorted(bin_locations, inputs, eps: float = 1e-6):
    """Vectorized per-element bin lookup (splines.py:11-13)."""
    bin_locations = bin_locations.at[..., -1].add(eps)
    return jnp.sum((inputs[..., None] >= bin_locations).astype(jnp.int32), axis=-1) - 1


def _normalize_bins(unnormalized, num_bins, min_size, left, right):
    """Softmax bin sizes with a floor, cumulative positions in [left, right]."""
    sizes = jax.nn.softmax(unnormalized, axis=-1)
    sizes = min_size + (1.0 - min_size * num_bins) * sizes
    cum = jnp.cumsum(sizes, axis=-1)
    cum = jnp.pad(cum, [(0, 0)] * (cum.ndim - 1) + [(1, 0)])
    span = right - left
    cum = left[..., None] + span[..., None] * cum
    # pin the exact endpoints (float cumsum drift)
    cum = cum.at[..., 0].set(left)
    cum = cum.at[..., -1].set(right)
    sizes = cum[..., 1:] - cum[..., :-1]
    return sizes, cum


def rational_quadratic_spline(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    derivatives,
    inverse: bool = False,
    left=None,
    right=None,
    bottom=None,
    top=None,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
):
    """Constrained RQ spline on [left,right] -> [bottom,top].

    ``derivatives`` are the *positive* knot slopes, shape (..., K+1) — callers
    apply softplus + min floor (see :func:`unconstrained_rational_quadratic_spline`).
    ``left/right/bottom/top`` broadcast against ``inputs``.  Returns
    ``(outputs, logabsdet)`` elementwise (no batch reduction here).

    Mirrors splines.py:100-219 semantics; all branches dense.
    """
    dtype = inputs.dtype
    num_bins = unnormalized_widths.shape[-1]
    if left is None:
        left = jnp.array(0.0, dtype)
    if right is None:
        right = jnp.array(1.0, dtype)
    if bottom is None:
        bottom = jnp.array(0.0, dtype)
    if top is None:
        top = jnp.array(1.0, dtype)
    left = jnp.broadcast_to(jnp.asarray(left, dtype), inputs.shape)
    right = jnp.broadcast_to(jnp.asarray(right, dtype), inputs.shape)
    bottom = jnp.broadcast_to(jnp.asarray(bottom, dtype), inputs.shape)
    top = jnp.broadcast_to(jnp.asarray(top, dtype), inputs.shape)

    widths, cumwidths = _normalize_bins(
        unnormalized_widths, num_bins, min_bin_width, left, right
    )
    heights, cumheights = _normalize_bins(
        unnormalized_heights, num_bins, min_bin_height, bottom, top
    )
    delta = heights / widths  # avg slope per bin

    bin_locations = cumheights if inverse else cumwidths
    bin_idx = jnp.clip(searchsorted(bin_locations, inputs), 0, num_bins - 1)
    idx = bin_idx[..., None]

    def take(arr):
        return jnp.take_along_axis(arr, idx, axis=-1)[..., 0]

    in_cumwidths = take(cumwidths)
    in_widths = take(widths)
    in_cumheights = take(cumheights)
    in_heights = take(heights)
    in_delta = take(delta)
    d_k = jnp.take_along_axis(derivatives, idx, axis=-1)[..., 0]  # left knot
    d_k1 = jnp.take_along_axis(derivatives, idx + 1, axis=-1)[..., 0]  # right knot

    if inverse:
        y_rel = inputs - in_cumheights
        s = d_k + d_k1 - 2.0 * in_delta
        a = in_heights * (in_delta - d_k) + y_rel * s
        b = in_heights * d_k - y_rel * s
        c = -in_delta * y_rel
        discriminant = b * b - 4.0 * a * c
        # clamp for safety (mathematically >= 0 inside the interval; see
        # splines.py:181 `assert (discriminant >= 0).all()`)
        discriminant = jnp.maximum(discriminant, 0.0)
        denom_root = -b - jnp.sqrt(discriminant)
        # 2c / (-b - sqrt(disc)) — stable quadratic root in [0, 1]
        theta = (2.0 * c) / jnp.where(denom_root == 0.0, 1e-38, denom_root)
        theta = jnp.clip(theta, 0.0, 1.0)
        outputs = theta * in_widths + in_cumwidths
        one_m_theta = 1.0 - theta
        theta_om = theta * one_m_theta
        denominator = in_delta + s * theta_om
        derivative_numerator = (in_delta * in_delta) * (
            d_k1 * theta * theta + 2.0 * in_delta * theta_om + d_k * one_m_theta * one_m_theta
        )
        logabsdet = -(jnp.log(derivative_numerator) - 2.0 * jnp.log(denominator))
        return outputs, logabsdet
    else:
        theta = (inputs - in_cumwidths) / in_widths
        theta = jnp.clip(theta, 0.0, 1.0)
        one_m_theta = 1.0 - theta
        theta_om = theta * one_m_theta
        s = d_k + d_k1 - 2.0 * in_delta
        numerator = in_heights * (in_delta * theta * theta + d_k * theta_om)
        denominator = in_delta + s * theta_om
        outputs = in_cumheights + numerator / denominator
        derivative_numerator = (in_delta * in_delta) * (
            d_k1 * theta * theta + 2.0 * in_delta * theta_om + d_k * one_m_theta * one_m_theta
        )
        logabsdet = jnp.log(derivative_numerator) - 2.0 * jnp.log(denominator)
        return outputs, logabsdet


def make_knot_derivatives(
    unnormalized_derivatives,
    tail_codes,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
):
    """Positive knot slopes (..., K+1) from raw slots per tail mode.

    ``unnormalized_derivatives``: (..., K+1) raw slots.
    ``tail_codes``: int array broadcastable to inputs (per-dim tail mode).
    - TAIL_NONE: all K+1 slots via min_derivative + softplus.
    - TAIL_LINEAR: interior slots 1..K-1 used; boundary slopes fixed to 1
      (the reference pads with ``log(e^{1-min_d} - 1)`` so softplus gives
      exactly 1 - min_d + min_d = 1; splines.py:34-47).
    - TAIL_CIRCULAR: slots 0..K-1 used; d[K] = d[0] (periodic closure).
    """
    dtype = unnormalized_derivatives.dtype
    d_all = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    # linear: ones at both boundary knots
    d_lin = d_all
    one = jnp.ones((), dtype)
    d_lin = d_lin.at[..., 0].set(one)
    d_lin = d_lin.at[..., -1].set(one)

    # circular: last = first
    d_circ = d_all.at[..., -1].set(d_all[..., 0])

    tc = jnp.broadcast_to(tail_codes, d_all.shape[:-1])[..., None]
    derivatives = jnp.where(
        tc == TAIL_LINEAR, d_lin, jnp.where(tc == TAIL_CIRCULAR, d_circ, d_all)
    )
    return derivatives


def unconstrained_rational_quadratic_spline(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse: bool = False,
    tail_codes=TAIL_LINEAR,
    tail_bound=1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
):
    """RQ spline with tails (splines.py:16-97), dense formulation.

    ``tail_codes``: scalar or per-dim int array (TAIL_LINEAR/TAIL_CIRCULAR/
    TAIL_NONE) broadcastable to ``inputs``; mixed per-dim tails supported
    (the reference's index-list mechanism, splines.py:49-59).
    ``tail_bound``: scalar or per-dim array B; interval is [-B, B].
    ``unnormalized_derivatives``: (..., K+1) uniform layout (see module doc).
    """
    dtype = inputs.dtype
    tail_bound = jnp.broadcast_to(jnp.asarray(tail_bound, dtype), inputs.shape)
    tail_codes_arr = jnp.broadcast_to(jnp.asarray(tail_codes), inputs.shape)
    left = -tail_bound
    right = tail_bound

    derivatives = make_knot_derivatives(
        unnormalized_derivatives, tail_codes_arr, min_derivative
    )

    inside = (inputs >= left) & (inputs <= right)
    # circular dims: wrap into the interval instead of identity outside
    span = right - left
    wrapped = left + jnp.mod(inputs - left, span)
    is_circ = tail_codes_arr == TAIL_CIRCULAR
    spline_in = jnp.where(is_circ, wrapped, jnp.clip(inputs, left, right))

    outputs_s, logabsdet_s = rational_quadratic_spline(
        spline_in,
        unnormalized_widths,
        unnormalized_heights,
        derivatives,
        inverse=inverse,
        left=left,
        right=right,
        bottom=left,
        top=right,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
    )

    use_spline = inside | is_circ
    outputs = jnp.where(use_spline, outputs_s, inputs)
    logabsdet = jnp.where(use_spline, logabsdet_s, jnp.zeros_like(inputs))
    return outputs, logabsdet
