"""Masked autoregressive RQ-spline transform
(reference: normflows/flows/neural_spline/autoregressive.py:17-134).

Uniform 3K+1 parameter layout (see coupling.py docstring); inverse runs the
D-step fixed-point recursion under ``lax.fori_loop`` (via the Autoregressive
base class) instead of a Python loop.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import static_field, buffer_field
from ...core.flow import sum_except_batch
from ...ops import splines, backend
from ...nets.made import MADE
from ...utils.nn import PeriodicFeaturesElementwise
from ..affine import autoregressive as ar_base
from ..affine.autoregressive import Autoregressive


class MaskedPiecewiseRationalQuadraticAutoregressive(Autoregressive):
    """MADE-parameterized RQ-spline AR transform (autoregressive.py:17-134)."""

    tail_codes: Optional[tuple] = static_field(default=None)
    tail_bound: Optional[tuple] = static_field(default=None)
    features: int = static_field(default=2)
    num_bins: int = static_field(default=10)
    constrained: bool = static_field(default=False)
    min_bin_width: float = static_field(default=splines.DEFAULT_MIN_BIN_WIDTH)
    min_bin_height: float = static_field(default=splines.DEFAULT_MIN_BIN_HEIGHT)
    min_derivative: float = static_field(default=splines.DEFAULT_MIN_DERIVATIVE)

    @classmethod
    def create(
        cls,
        key,
        features: int,
        hidden_features: int,
        context_features=None,
        num_bins: int = 10,
        tails=None,
        tail_bound=1.0,
        num_blocks: int = 2,
        use_residual_blocks: bool = True,
        random_mask: bool = False,
        permute_mask: bool = False,
        activation: str = "relu",
        dropout_probability: float = 0.0,
        use_batch_norm: bool = False,
        init_identity: bool = True,
        rng_seed: int = 0,
        min_bin_width=splines.DEFAULT_MIN_BIN_WIDTH,
        min_bin_height=splines.DEFAULT_MIN_BIN_HEIGHT,
        min_derivative=splines.DEFAULT_MIN_DERIVATIVE,
    ):
        # circular preprocessing (autoregressive.py:44-53)
        preprocessing = None
        if isinstance(tails, (list, tuple)):
            ind_circ = [i for i in range(features) if tails[i] == "circular"]
            if ind_circ:
                tb = np.asarray(tail_bound, np.float32)
                scale_pf = (
                    np.pi / tb[ind_circ] if tb.ndim > 0 else np.pi / float(tail_bound)
                )
                preprocessing = PeriodicFeaturesElementwise.create(
                    features, ind_circ, scale_pf
                )
            codes = np.asarray(
                [splines.tail_code(t) for t in tails], np.int32
            )
            constrained = False
        elif isinstance(tails, str):
            codes = np.full(features, splines.tail_code(tails), np.int32)
            constrained = False
        else:
            codes = None
            constrained = True

        multiplier = 3 * num_bins + 1  # uniform layout
        made = MADE.create(
            key,
            features=features,
            hidden_features=hidden_features,
            context_features=context_features,
            num_blocks=num_blocks,
            output_multiplier=multiplier,
            use_residual_blocks=use_residual_blocks,
            random_mask=random_mask,
            permute_mask=permute_mask,
            activation=activation,
            dropout_probability=dropout_probability,
            use_batch_norm=use_batch_norm,
            preprocessing=preprocessing,
            rng_seed=rng_seed,
        )
        if init_identity:
            constant = float(np.log(np.exp(1 - min_derivative) - 1))
            made = made.replace(
                final_layer=made.final_layer.replace(
                    weight=jnp.zeros_like(made.final_layer.weight),
                    bias=jnp.full_like(made.final_layer.bias, constant),
                )
            )
        bound = (
            np.full(features, float(tail_bound), np.float32)
            if np.ndim(tail_bound) == 0
            else np.asarray(tail_bound, np.float32)
        )
        return cls(
            autoregressive_net=made,
            tail_codes=None if codes is None else tuple(int(c) for c in codes),
            tail_bound=tuple(float(b) for b in bound),
            features=features,
            num_bins=num_bins,
            constrained=constrained,
            min_bin_width=min_bin_width,
            min_bin_height=min_bin_height,
            min_derivative=min_derivative,
        )

    def _elementwise(self, inputs, params, inverse):
        b = inputs.shape[0]
        params = params.reshape(b, self.features, 3 * self.num_bins + 1)
        K = self.num_bins
        uw = params[..., :K]
        uh = params[..., K : 2 * K]
        ud = params[..., 2 * K :]
        # NOTE: unlike the coupling path, NO 1/sqrt(hidden) softmax rescale
        # here — the reference gates it on hasattr(net, "hidden_features")
        # (autoregressive.py:106-108) and its MADE never sets that attribute,
        # so the reference AR layer runs unscaled (verified by oracle parity,
        # tests/test_reference_parity.py AR wrapper tests).
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
              and isinstance(inputs.shape[0], int)):  # symbolic batch -> jnp
            from ...ops.spline_pallas import (
                unconstrained_rational_quadratic_spline_pallas,
            )

            outputs, logabsdet = unconstrained_rational_quadratic_spline_pallas(
                inputs, uw, uh, ud, self.tail_codes, self.tail_bound,
                inverse, self.min_bin_width, self.min_bin_height,
                self.min_derivative, False, -1,
            )
        else:
            outputs, logabsdet = splines.unconstrained_rational_quadratic_spline(
                inputs, uw, uh, ud, inverse=inverse,
                tail_codes=jnp.asarray(np.asarray(self.tail_codes)),
                tail_bound=jnp.asarray(np.asarray(self.tail_bound, np.float32)),
                min_bin_width=self.min_bin_width,
                min_bin_height=self.min_bin_height,
                min_derivative=self.min_derivative,
            )
        return outputs, sum_except_batch(logabsdet)

    def _elementwise_inverse_single(self, x_col, params, dim_idx):
        """One feature's RQS inverse for the sliced sequential recursion:
        ``x_col`` (B, 1), ``params`` (B, 3K+1), ``dim_idx`` traced feature
        position (selects that dim's tail code / bound)."""
        K = self.num_bins
        uw = params[:, None, :K]
        uh = params[:, None, K:2 * K]
        ud = params[:, None, 2 * K:]
        if self.constrained:
            derivs = splines.make_knot_derivatives(
                ud, jnp.int32(splines.TAIL_NONE), self.min_derivative)
            out, ld = splines.rational_quadratic_spline(
                x_col, uw, uh, derivs, inverse=True,
                min_bin_width=self.min_bin_width,
                min_bin_height=self.min_bin_height,
            )
        else:
            codes = jnp.asarray(np.asarray(self.tail_codes, np.int32))[dim_idx]
            bound = jnp.asarray(np.asarray(self.tail_bound, np.float32))[dim_idx]
            out, ld = splines.unconstrained_rational_quadratic_spline(
                x_col, uw, uh, ud, inverse=True,
                tail_codes=jnp.broadcast_to(codes, x_col.shape),
                tail_bound=jnp.broadcast_to(bound, x_col.shape),
                min_bin_width=self.min_bin_width,
                min_bin_height=self.min_bin_height,
                min_derivative=self.min_derivative,
            )
        return out, ld[:, 0]

    def _elementwise_inverse_row(self, x_row, params_rows, dim_idx):
        """Single-feature RQS inverse in the transposed layout, for the
        sliced sequential recursion: ``x_row`` (1, B), ``params_rows``
        (3K+1, B), batch on lanes.  Uses the dynamic-codes flat Pallas
        kernel (the active feature's tail code/bound is a loop variable);
        the jnp spline here measured 0.26 ms PER CALL inside the recursion
        (unfused ~30-op graphs on a (B, 1) slice) — 64 calls cost more than
        the whole PALLAS-backed naive path (docs/performance.md "Large-D
        autoregressive").  That comparison cannot arise in practice: the
        naive recursion's full-width spline gates on exactly the same
        (use_pallas, f32, unconstrained) conditions as this row kernel, so
        whenever the fallback below runs, the naive path would be running
        the full-width jnp spline D times instead (measured 1510 ms at
        D=64 — ~90x worse than D jnp row splines)."""
        if (backend.use_pallas() and x_row.dtype == jnp.float32
                and not self.constrained):
            from ...ops.spline_pallas import unconstrained_rqs_pallas_dyncodes

            K = self.num_bins
            B = x_row.shape[1]
            codes = jnp.broadcast_to(
                jnp.asarray(np.asarray(self.tail_codes, np.int32))[dim_idx],
                (B,))
            bound = jnp.broadcast_to(
                jnp.asarray(np.asarray(self.tail_bound, np.float32))[dim_idx],
                (B,))
            y, ld = unconstrained_rqs_pallas_dyncodes(
                x_row.reshape(-1), params_rows[:K], params_rows[K:2 * K],
                params_rows[2 * K:], codes, bound, True,
                self.min_bin_width, self.min_bin_height, self.min_derivative,
                backend.pallas_interpret(),
            )
            return y.reshape(1, -1), ld
        return super()._elementwise_inverse_row(x_row, params_rows, dim_idx)

    # ---- transposed (planar) fast path -----------------------------------
    def _transposed_ok(self, inputs, context, key=None):
        """Gate for the zero-relayout pipeline: transposed MADE
        (nets/made.py apply_t) feeding the planar spline kernel
        (ops/spline_pallas.py rqs_transposed_pallas).  Eliminates the
        (B*F, S) <-> (S, B*F) relayouts around every spline call — measured
        ~5.7 ms of the 10.3 ms flagship step (docs/performance.md)."""
        return (
            backend.use_pallas()
            and not self.constrained
            and (context is None
                 or hasattr(self.autoregressive_net, "context_cache_t"))
            and inputs.ndim == 2
            and inputs.dtype == jnp.float32
            # symbolic batch dims (jax.export shape polymorphism) take the
            # general path — the kernel needs a concrete grid
            and isinstance(inputs.shape[0], int)
            and inputs.shape[0] >= 1024
            # the transposed inverse unrolls F-1 MADE passes and the kernel
            # holds F*(3K+1) parameter planes in VMEM per block — keep the
            # base class's fori_loop protection (and the VMEM budget) for
            # wide feature counts
            and self.features <= 8
            and self.features * (3 * self.num_bins + 1) <= 128
            and hasattr(self.autoregressive_net, "supports_t")
            and self.autoregressive_net.supports_t()
            # train-time dropout (key + configured probability) needs the
            # key-threaded general path; apply_t has no dropout plumbing
            and not ar_base._dropout_active(self.autoregressive_net, key)
        )

    def _spline_t(self, x_t, params_t, inverse):
        from ...ops.spline_pallas import rqs_transposed_pallas

        return rqs_transposed_pallas(
            x_t, params_t.astype(x_t.dtype), self.tail_codes, self.tail_bound,
            inverse, self.min_bin_width, self.min_bin_height,
            self.min_derivative, backend.pallas_interpret(),
        )

    def forward(self, inputs, context=None, *, key=None):
        if not self._transposed_ok(inputs, context, key):
            return super().forward(inputs, context, key=key)
        net = self.autoregressive_net
        x_t = inputs.T
        cache = net.context_cache_t(context) if context is not None else None
        params_t = ar_base._apply_t(net, x_t, cache)
        y_t, ld_t = self._spline_t(x_t, params_t, inverse=False)
        return y_t.T, jnp.sum(ld_t, axis=0)

    def inverse(self, inputs, context=None, *, key=None):
        if not self._transposed_ok(inputs, context, key):
            return super().inverse(inputs, context, key=key)
        net = self.autoregressive_net
        x_t = inputs.T
        F, B = x_t.shape
        cache = net.context_cache_t(context) if context is not None else None
        if cache is None:
            # pass 1 via the batch-1 trick (see Autoregressive.inverse): the
            # degree-1 slots of MADE(0) are batch-constant, so one column
            # broadcast over the batch is exact, gradients included
            p1 = net.apply_t(jnp.zeros((F, 1), x_t.dtype))
            params_t = jnp.broadcast_to(p1, (p1.shape[0], B))
        else:
            # conditional: the context varies per batch element, so the
            # degree-1 slots are NOT batch-constant — full-width pass 1
            params_t = net.apply_t(jnp.zeros_like(x_t), cache)
        out_t, ld_t = self._spline_t(x_t, params_t, inverse=True)
        for _ in range(1, F):
            params_t = ar_base._apply_t(net, out_t, cache)
            out_t, ld_t = self._spline_t(x_t, params_t, inverse=True)
        return out_t.T, jnp.sum(ld_t, axis=0)

    def _elementwise_forward(self, inputs, params):
        return self._elementwise(inputs, params, inverse=False)

    def _elementwise_inverse(self, inputs, params):
        return self._elementwise(inputs, params, inverse=True)
