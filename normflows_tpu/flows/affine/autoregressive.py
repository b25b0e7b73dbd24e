"""Autoregressive flows (reference: normflows/flows/affine/autoregressive.py).

TPU-first change: the reference's inverse runs D sequential full-MADE passes in
a Python loop (autoregressive.py:29-38).  Here that loop is a
``jax.lax.fori_loop`` — one compiled loop body regardless of D, so the deep
sequential dependency costs no trace/compile blowup and stays on-device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Module, static_field
from ...core.flow import Flow, sum_except_batch
from ...nets.made import MADE
from ...utils.nn import net_dropout_active as _dropout_active


def _apply_t(net, x_t, ctx_cache):
    """Transposed net pass, threading the context cache only when present:
    custom nets may implement the single-argument ``apply_t`` signature."""
    return net.apply_t(x_t, ctx_cache) if ctx_cache is not None else net.apply_t(x_t)


class Autoregressive(Flow):
    """Elementwise transform with autoregressive parameters (autoregressive.py:10-47)."""

    autoregressive_net: Module

    def _elementwise_forward(self, inputs, params):
        raise NotImplementedError

    def _elementwise_inverse(self, inputs, params):
        raise NotImplementedError

    def forward(self, inputs, context=None, *, key=None):
        if _dropout_active(self.autoregressive_net, key):
            params = self.autoregressive_net(inputs, context, key=key,
                                             train=True)
        else:
            params = self.autoregressive_net(inputs, context)
        return self._elementwise_forward(inputs, params)

    def _elementwise_inverse_single(self, x_col, params, dim_idx):
        """Inverse transform of ONE feature column: ``x_col`` (B, 1),
        ``params`` (B, multiplier), ``dim_idx`` the (traced) feature
        position.  Subclasses implement this to enable the sliced
        sequential inverse; returns (y_col (B, 1), log_det (B,))."""
        raise NotImplementedError

    def _elementwise_inverse_row(self, x_row, params_rows, dim_idx):
        """Transposed-layout adapter for the sliced inverse: ``x_row``
        (1, B), ``params_rows`` (mult, B) -> (y_row (1, B), log_det (B,)).
        Default bridges to :meth:`_elementwise_inverse_single` via two tiny
        (mult, B) transposes; planar subclasses may override."""
        y_col, ld = self._elementwise_inverse_single(
            x_row.T, params_rows.T, dim_idx)
        return y_col.T, ld

    def _sliced_inverse_ok(self, inputs, dropout_on, context=None):
        """Gate for the sliced sequential inverse: at recursion step t only
        the feature of degree t+1 becomes final, so only that feature's
        elementwise transform (and parameter slice) is computed — the
        reference instead recomputes the full-width transform D times
        (autoregressive.py:29-38).  Runs in the TRANSPOSED layout (batch on
        lanes): the per-step feature indexing then lands on the MAJOR axis,
        which is a cheap offset on TPU — dynamic indexing on the lane axis
        relayouts the whole array every pass (measured 1.7x SLOWER than the
        naive recursion at D=64; docs/performance.md "Large-D
        autoregressive").  Exact: each feature's final value depends only on
        already-final features.  Conditional models are covered via the
        per-pass-constant context cache (nets/made.py context_cache_t)."""
        net = self.autoregressive_net
        return (
            inputs.ndim == 2
            # symbolic batch dims (jax.export shape polymorphism) take the
            # general path — the dyncodes kernel needs a concrete grid
            and isinstance(inputs.shape[0], int)
            and not dropout_on
            and getattr(net, "input_order", None) is not None
            and hasattr(net, "supports_t")
            and net.supports_t()
            and hasattr(net, "apply_t")
            and (context is None or hasattr(net, "context_cache_t"))
            and type(self)._elementwise_inverse_single
            is not Autoregressive._elementwise_inverse_single
        )

    def _inverse_sliced(self, inputs, context=None):
        net = self.autoregressive_net
        B, F = inputs.shape
        mult = net.final_layer.weight.shape[1] // F
        order_arr = net.input_order
        x_t = inputs.T  # single relayout in; batch stays on lanes throughout
        # context is constant across the D passes: project it ONCE
        ctx_cache = (net.context_cache_t(context)
                     if context is not None else None)

        def body(t, carry):
            out_t, ld = carry
            # full-width transposed MADE pass: all matmuls dense on the MXU
            # (slicing the final layer's weight per step measured SLOWER —
            # the full matmul is MXU-bound while per-step weight gathers
            # serialize; see docs/performance.md)
            params_t = _apply_t(net, out_t, ctx_cache)  # (F*mult, B)
            p = order_arr[t]
            rows = jax.lax.dynamic_slice_in_dim(params_t, p * mult, mult, 0)
            x_row = jax.lax.dynamic_slice_in_dim(x_t, p, 1, 0)  # (1, B)
            y_row, ld_col = self._elementwise_inverse_row(x_row, rows, p)
            out_t = jax.lax.dynamic_update_slice_in_dim(
                out_t, y_row.astype(out_t.dtype), p, 0)
            return out_t, ld + ld_col

        carry = (jnp.zeros_like(x_t), jnp.zeros(B, inputs.dtype))
        out_t, ld = jax.lax.fori_loop(0, F, body, carry)
        return out_t.T, ld

    def inverse(self, inputs, context=None, *, key=None):
        num_inputs = int(np.prod(inputs.shape[1:]))
        dropout_on = _dropout_active(self.autoregressive_net, key)
        if num_inputs > 8 and self._sliced_inverse_ok(inputs, dropout_on,
                                                      context):
            return self._inverse_sliced(inputs, context)

        def body(i, carry):
            outputs, _ = carry
            if dropout_on:
                # fresh dropout mask per sequential pass, like D torch
                # forward passes in train mode (autoregressive.py:29-38)
                params = self.autoregressive_net(
                    outputs, context, key=jax.random.fold_in(key, i),
                    train=True)
            else:
                params = self.autoregressive_net(outputs, context)
            return self._elementwise_inverse(inputs, params)

        carry = (jnp.zeros_like(inputs), jnp.zeros(inputs.shape[0], inputs.dtype))
        start = 0
        if context is None and not dropout_on:
            # First recursion pass: MADE's autoregressive property makes the
            # degree-1 output slots *input-independent* (their strict mask
            # connects them to nothing), and every sample feeds the same
            # all-zeros carry — so the batch-wide net pass is replaced by a
            # single-row pass broadcast over the batch.  Exact (identical
            # values and, via broadcast-sum, identical weight gradients);
            # saves 1/D of the net FLOPs in the sampling direction.
            p1 = self.autoregressive_net(jnp.zeros_like(inputs[:1]), None)
            params = jnp.broadcast_to(p1, (inputs.shape[0], *p1.shape[1:]))
            carry = self._elementwise_inverse(inputs, params)
            start = 1
        if num_inputs <= 8:
            # unroll short recursions: XLA fuses/pipelines across iterations
            # (a lax loop serializes them; ~2x step time on the D=2 flagship)
            for i in range(start, num_inputs):
                carry = body(i, carry)
            outputs, logabsdet = carry
        else:
            outputs, logabsdet = jax.lax.fori_loop(start, num_inputs, body, carry)
        return outputs, logabsdet


def _constrain_scale(unconstrained):
    """MAF scale parameterization, sigmoid(s + 2) + 1e-3
    (autoregressive.py:84-88) — the single source shared by the batched,
    sliced-column, and sliced-row inverse paths so it cannot drift."""
    return jax.nn.sigmoid(unconstrained + 2.0) + 1e-3


class MaskedAffineAutoregressive(Autoregressive):
    """MAF layer (autoregressive.py:50-128); scale = sigmoid(s + 2) + 1e-3."""

    features: int = static_field(default=2)

    @classmethod
    def create(
        cls,
        key,
        features: int,
        hidden_features: int,
        context_features=None,
        num_blocks: int = 2,
        use_residual_blocks: bool = True,
        random_mask: bool = False,
        activation: str = "relu",
        dropout_probability: float = 0.0,
        use_batch_norm: bool = False,
        rng_seed: int = 0,
    ):
        made = MADE.create(
            key,
            features=features,
            hidden_features=hidden_features,
            context_features=context_features,
            num_blocks=num_blocks,
            output_multiplier=2,
            use_residual_blocks=use_residual_blocks,
            random_mask=random_mask,
            activation=activation,
            dropout_probability=dropout_probability,
            use_batch_norm=use_batch_norm,
            rng_seed=rng_seed,
        )
        return cls(autoregressive_net=made, features=features)

    def _scale_shift(self, params):
        params = params.reshape(-1, self.features, 2)
        shift = params[..., 1]
        scale = _constrain_scale(params[..., 0])
        return scale, shift

    def _elementwise_forward(self, inputs, params):
        scale, shift = self._scale_shift(params)
        outputs = scale * inputs + shift
        return outputs, sum_except_batch(jnp.log(scale))

    def _elementwise_inverse(self, inputs, params):
        scale, shift = self._scale_shift(params)
        outputs = (inputs - shift) / scale
        return outputs, -sum_except_batch(jnp.log(scale))

    def _elementwise_inverse_single(self, x_col, params, dim_idx):
        # params (B, 2): [unconstrained_scale, shift] — the mult=2 slice of
        # the (B, F, 2) layout _scale_shift reshapes
        scale = _constrain_scale(params[:, :1])
        shift = params[:, 1:]
        return (x_col - shift) / scale, -jnp.log(scale[:, 0])

    def _elementwise_inverse_row(self, x_row, params_rows, dim_idx):
        # planar form, no transposes: params_rows (2, B)
        scale = _constrain_scale(params_rows[0:1])
        shift = params_rows[1:2]
        return (x_row - shift) / scale, -jnp.log(scale[0])
