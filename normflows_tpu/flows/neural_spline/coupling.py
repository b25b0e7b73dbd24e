"""Neural-spline coupling layers (reference: normflows/flows/neural_spline/coupling.py).

TPU-first divergence from the reference: spline parameters use a **uniform
layout of 3*num_bins + 1 slots per transformed dim** for every tail mode,
instead of the reference's ragged per-tail counts (coupling.py:321-327).  Tail
handling picks the slots it needs (ops/splines.py); the regular layout keeps
every reshape static and lets one fused kernel serve all tail modes.  The
identity-init trick (zero final layer, bias = log(e^{1-min_d}-1)) still yields
an exact identity transform under this layout.

Feature scatter/gather uses static index arrays precomputed from the mask
(replacing boolean ``masked_select`` + in-place scatter, coupling.py:42-47,
94-96).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Module, static_field, buffer_field
from ...core.flow import Flow, sum_except_batch
from ...ops import splines, backend
from ...utils.nn import net_dropout_active as _net_dropout_active


def _split_indices(mask):
    mask = np.asarray(mask)
    identity = np.nonzero(mask <= 0)[0]
    transform = np.nonzero(mask > 0)[0]
    perm = np.concatenate([identity, transform])
    inv_perm = np.zeros_like(perm)
    inv_perm[perm] = np.arange(len(perm))
    return identity, transform, inv_perm


def _tail_codes_array(tails, indices):
    """Per-dim tail-code array for the selected feature indices."""
    if tails is None:
        return None  # constrained spline
    if isinstance(tails, str):
        return np.full(len(indices), splines.tail_code(tails), np.int32)
    tails = list(tails)
    return np.asarray([splines.tail_code(tails[i]) for i in indices], np.int32)


def _tail_bound_array(tail_bound, indices, n):
    if np.ndim(tail_bound) == 0:
        return np.full(len(indices), float(tail_bound), np.float32)
    return np.asarray(tail_bound, np.float32)[np.asarray(indices)]


class Coupling(Flow):
    """Mask-indexed coupling base (coupling.py:16-140).

    forward transforms the masked (mask>0) features conditioned on the identity
    features; supports NxD and NxCxHxW inputs.
    """

    transform_net: Module
    unconditional_transform: Optional[Flow]
    identity_features: jnp.ndarray = buffer_field()
    transform_features: jnp.ndarray = buffer_field()
    inv_perm: jnp.ndarray = buffer_field()

    def _split(self, inputs):
        id_split = jnp.take(inputs, self.identity_features, axis=1)
        tr_split = jnp.take(inputs, self.transform_features, axis=1)
        return id_split, tr_split

    def _join(self, id_split, tr_split):
        cat = jnp.concatenate([id_split, tr_split], axis=1)
        return jnp.take(cat, self.inv_perm, axis=1)

    def _coupling_transform(self, inputs, params, inverse):
        raise NotImplementedError

    def forward(self, inputs, context=None, *, key=None):
        id_split, tr_split = self._split(inputs)
        params = _apply_net(self.transform_net, id_split, context, key)
        tr_split, logabsdet = self._coupling_transform(tr_split, params, inverse=False)
        if self.unconditional_transform is not None:
            id_split, ld_id = self.unconditional_transform.forward(id_split, context)
            logabsdet = logabsdet + ld_id
        return self._join(id_split, tr_split), logabsdet

    def inverse(self, inputs, context=None, *, key=None):
        id_split, tr_split = self._split(inputs)
        logabsdet = jnp.zeros(inputs.shape[0], inputs.dtype)
        if self.unconditional_transform is not None:
            id_split, logabsdet = self.unconditional_transform.inverse(
                id_split, context
            )
        params = _apply_net(self.transform_net, id_split, context, key)
        tr_split, ld = self._coupling_transform(tr_split, params, inverse=True)
        return self._join(id_split, tr_split), logabsdet + ld



def _apply_net(net, x, context, key):
    if _net_dropout_active(net, key):
        return net(x, context, key=key, train=True)
    return net(x, context)


def _reshape_params(inputs, params):
    """B x (C*m) [x H x W] -> B x C [x H x W] x m (coupling.py:150-160)."""
    if inputs.ndim == 4:
        b, c, h, w = inputs.shape
        params = params.reshape(b, c, -1, h, w)
        return jnp.transpose(params, (0, 1, 3, 4, 2))
    b, d = inputs.shape
    return params.reshape(b, d, -1)


class PiecewiseRationalQuadraticCoupling(Coupling):
    """RQ-spline coupling (coupling.py:262-362), uniform 3K+1 param layout.

    Tail modes/bounds are static config (hashable tuples), which lets the
    fused Pallas kernel path (ops/spline_pallas.py) specialize on them.
    """

    tr_tail_codes: Optional[tuple] = static_field(default=None)
    tr_tail_bound: Optional[tuple] = static_field(default=None)
    num_bins: int = static_field(default=8)
    constrained: bool = static_field(default=False)
    net_hidden: int = static_field(default=0)
    min_bin_width: float = static_field(default=splines.DEFAULT_MIN_BIN_WIDTH)
    min_bin_height: float = static_field(default=splines.DEFAULT_MIN_BIN_HEIGHT)
    min_derivative: float = static_field(default=splines.DEFAULT_MIN_DERIVATIVE)

    @classmethod
    def create(
        cls,
        mask,
        transform_net_create_fn,
        num_bins: int = 8,
        tails=None,
        tail_bound=1.0,
        apply_unconditional_transform: bool = False,
        img_shape=None,
        min_bin_width=splines.DEFAULT_MIN_BIN_WIDTH,
        min_bin_height=splines.DEFAULT_MIN_BIN_HEIGHT,
        min_derivative=splines.DEFAULT_MIN_DERIVATIVE,
    ):
        identity, transform, inv_perm = _split_indices(mask)
        multiplier = 3 * num_bins + 1  # uniform layout (see module docstring)
        net = transform_net_create_fn(len(identity), len(transform) * multiplier)
        net_hidden = getattr(net, "hidden_features", 0) or getattr(
            net, "hidden_channels", 0
        )

        tr_codes = _tail_codes_array(tails, transform)
        id_codes = _tail_codes_array(tails, identity)
        constrained = tails is None
        tr_bound = _tail_bound_array(tail_bound, transform, len(mask))
        id_bound = _tail_bound_array(tail_bound, identity, len(mask))

        uncond = None
        if apply_unconditional_transform:
            shape = [len(identity)] + (list(img_shape) if img_shape else [])
            uncond = PiecewiseRationalQuadraticCDF.create(
                shape=shape,
                num_bins=num_bins,
                tails=None if constrained else id_codes,
                tail_bound=id_bound,
                min_bin_width=min_bin_width,
                min_bin_height=min_bin_height,
                min_derivative=min_derivative,
            )
        return cls(
            transform_net=net,
            unconditional_transform=uncond,
            identity_features=jnp.asarray(identity),
            transform_features=jnp.asarray(transform),
            inv_perm=jnp.asarray(inv_perm),
            tr_tail_codes=None if tr_codes is None else tuple(int(c) for c in tr_codes),
            tr_tail_bound=tuple(float(b) for b in tr_bound),
            num_bins=num_bins,
            constrained=constrained,
            net_hidden=int(net_hidden),
            min_bin_width=min_bin_width,
            min_bin_height=min_bin_height,
            min_derivative=min_derivative,
        )

    def _coupling_transform(self, inputs, params, inverse):
        params = _reshape_params(inputs, params)
        K = self.num_bins
        uw = params[..., :K]
        uh = params[..., K : 2 * K]
        ud = params[..., 2 * K :]
        if self.net_hidden:
            scale = 1.0 / np.sqrt(self.net_hidden)
            uw = uw * scale
            uh = uh * scale
        if self.constrained:
            derivs = splines.make_knot_derivatives(
                ud, jnp.int32(splines.TAIL_NONE), self.min_derivative
            )
            outputs, logabsdet = splines.rational_quadratic_spline(
                inputs, uw, uh, derivs, inverse=inverse,
                min_bin_width=self.min_bin_width,
                min_bin_height=self.min_bin_height,
            )
        elif (backend.use_pallas() and inputs.dtype == jnp.float32
              and isinstance(inputs.shape[0], int)):  # symbolic -> jnp
            from ...ops.spline_pallas import (
                unconstrained_rational_quadratic_spline_pallas,
            )

            event_axis = 1 if inputs.ndim == 4 else -1
            outputs, logabsdet = unconstrained_rational_quadratic_spline_pallas(
                inputs, uw, uh, ud, self.tr_tail_codes, self.tr_tail_bound,
                inverse, self.min_bin_width, self.min_bin_height,
                self.min_derivative, False, event_axis,
            )
        else:
            codes = np.asarray(self.tr_tail_codes)
            bound = np.asarray(self.tr_tail_bound, np.float32)
            if inputs.ndim == 4:  # per-channel broadcast over H, W
                codes = codes[None, :, None, None]
                bound = bound[None, :, None, None]
            outputs, logabsdet = splines.unconstrained_rational_quadratic_spline(
                inputs, uw, uh, ud, inverse=inverse,
                tail_codes=jnp.asarray(codes), tail_bound=jnp.asarray(bound),
                min_bin_width=self.min_bin_width,
                min_bin_height=self.min_bin_height,
                min_derivative=self.min_derivative,
            )
        return outputs, sum_except_batch(logabsdet)


class PiecewiseRationalQuadraticCDF(Flow):
    """Elementwise learned RQ spline (coupling.py:170-259)."""

    unnormalized_widths: jnp.ndarray
    unnormalized_heights: jnp.ndarray
    unnormalized_derivatives: jnp.ndarray
    tail_codes: Optional[tuple] = static_field(default=None)
    tail_bound: Optional[tuple] = static_field(default=None)
    constrained: bool = static_field(default=False)
    min_bin_width: float = static_field(default=splines.DEFAULT_MIN_BIN_WIDTH)
    min_bin_height: float = static_field(default=splines.DEFAULT_MIN_BIN_HEIGHT)
    min_derivative: float = static_field(default=splines.DEFAULT_MIN_DERIVATIVE)

    @classmethod
    def create(
        cls,
        shape,
        num_bins: int = 10,
        tails=None,
        tail_bound=1.0,
        identity_init: bool = True,
        key=None,
        min_bin_width=splines.DEFAULT_MIN_BIN_WIDTH,
        min_bin_height=splines.DEFAULT_MIN_BIN_HEIGHT,
        min_derivative=splines.DEFAULT_MIN_DERIVATIVE,
    ):
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        if tails is None:
            codes = None
            constrained = True
        elif isinstance(tails, str):
            codes = np.full(shape[0], splines.tail_code(tails), np.int32)
            constrained = False
        else:
            codes = np.asarray([splines.tail_code(t) for t in np.asarray(tails)],
                               np.int32)
            constrained = False
        bound = (
            np.full(shape[0], float(tail_bound), np.float32)
            if np.ndim(tail_bound) == 0
            else np.asarray(tail_bound, np.float32)
        )
        if identity_init:
            uw = jnp.zeros((*shape, num_bins))
            uh = jnp.zeros((*shape, num_bins))
            constant = float(np.log(np.exp(1 - min_derivative) - 1))
            ud = jnp.full((*shape, num_bins + 1), constant)
        else:
            if key is None:
                key = jax.random.key(0)
            k1, k2, k3 = jax.random.split(key, 3)
            uw = jax.random.uniform(k1, (*shape, num_bins))
            uh = jax.random.uniform(k2, (*shape, num_bins))
            ud = jax.random.uniform(k3, (*shape, num_bins + 1))
        return cls(
            unnormalized_widths=uw,
            unnormalized_heights=uh,
            unnormalized_derivatives=ud,
            tail_codes=None if codes is None else tuple(int(c) for c in codes),
            tail_bound=tuple(float(b) for b in bound),
            constrained=constrained,
            min_bin_width=min_bin_width,
            min_bin_height=min_bin_height,
            min_derivative=min_derivative,
        )

    def _spline(self, inputs, inverse):
        b = inputs.shape[0]
        uw = jnp.broadcast_to(self.unnormalized_widths, (b, *self.unnormalized_widths.shape))
        uh = jnp.broadcast_to(self.unnormalized_heights, (b, *self.unnormalized_heights.shape))
        ud = jnp.broadcast_to(
            self.unnormalized_derivatives, (b, *self.unnormalized_derivatives.shape)
        )
        if self.constrained:
            derivs = splines.make_knot_derivatives(
                ud, jnp.int32(splines.TAIL_NONE), self.min_derivative
            )
            outputs, logabsdet = splines.rational_quadratic_spline(
                inputs, uw, uh, derivs, inverse=inverse,
                min_bin_width=self.min_bin_width,
                min_bin_height=self.min_bin_height,
            )
        elif (backend.use_pallas() and inputs.dtype == jnp.float32
              and isinstance(inputs.shape[0], int)):  # symbolic -> jnp
            from ...ops.spline_pallas import (
                unconstrained_rational_quadratic_spline_pallas,
            )

            # per-dim config aligns with the first event axis (axis 1)
            outputs, logabsdet = unconstrained_rational_quadratic_spline_pallas(
                inputs, uw, uh, ud, self.tail_codes, self.tail_bound,
                inverse, self.min_bin_width, self.min_bin_height,
                self.min_derivative, False, 1,
            )
        else:
            codes = np.asarray(self.tail_codes)
            bound = np.asarray(self.tail_bound, np.float32)
            # codes/bound are per leading dim of the param shape; broadcast to
            # the event: (C,) -> (C, 1, ...) matching inputs[1:].
            extra = inputs.ndim - 2
            for _ in range(extra):
                codes = codes[:, None]
                bound = bound[:, None]
            outputs, logabsdet = splines.unconstrained_rational_quadratic_spline(
                inputs, uw, uh, ud, inverse=inverse,
                tail_codes=jnp.asarray(codes), tail_bound=jnp.asarray(bound),
                min_bin_width=self.min_bin_width,
                min_bin_height=self.min_bin_height,
                min_derivative=self.min_derivative,
            )
        return outputs, sum_except_batch(logabsdet)

    def forward(self, inputs, context=None, *, key=None):
        return self._spline(inputs, inverse=False)

    def inverse(self, inputs, context=None, *, key=None):
        return self._spline(inputs, inverse=True)
