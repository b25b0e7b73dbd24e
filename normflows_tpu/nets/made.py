"""MADE — masked autoregressive parameter network.

Behavioral re-implementation of the reference MADE
(``/root/reference/normflows/nets/made.py:19-304``, itself from
bayesiains/nsf) with TPU-first choices: degree masks are computed **once with
numpy at construction** and stored as non-trainable buffers (static shapes, no
host work at trace time); masked matmuls run as dense ``(W * mask)`` products —
on the MXU a dense masked matmul beats any gather-based sparse trick at these
sizes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module, static_field, buffer_field
from .resnet import _dropout, _check_no_batch_norm
from .mlp import Linear


def _input_degrees(features: int) -> np.ndarray:
    return np.arange(1, features + 1)


def _hidden_degrees(out_features: int, autoregressive_features: int,
                    rng: Optional[np.random.Generator], min_in_degree: int):
    """Degrees for a hidden masked layer (made.py:62-76)."""
    if rng is not None:  # random mask
        lo = min(min_in_degree, autoregressive_features - 1)
        return rng.integers(lo, autoregressive_features, size=out_features)
    max_ = max(1, autoregressive_features - 1)
    min_ = min(1, autoregressive_features - 1)
    return np.arange(out_features) % max_ + min_


class MaskedLinear(Module):
    """Linear layer with a fixed autoregressive mask (made.py:19-81)."""

    weight: jnp.ndarray  # (in, out)
    bias: Optional[jnp.ndarray]
    mask: jnp.ndarray = buffer_field()  # (in, out)
    degrees: jnp.ndarray = buffer_field()  # (out,)
    compute_dtype: Optional[str] = static_field(default=None)

    @classmethod
    def create(
        cls,
        key,
        in_degrees: np.ndarray,
        out_features: int,
        autoregressive_features: int,
        random_mask: bool = False,
        is_output: bool = False,
        bias: bool = True,
        out_degrees_: Optional[np.ndarray] = None,
        rng_seed: int = 0,
    ):
        in_degrees = np.asarray(in_degrees)
        in_features = len(in_degrees)
        if is_output:
            if out_degrees_ is None:
                out_degrees_ = _input_degrees(autoregressive_features)
            out_degrees = np.repeat(
                np.asarray(out_degrees_),
                out_features // autoregressive_features,
            )
            # strict mask: output connects only to strictly-lower degrees
            mask = (out_degrees[:, None] > in_degrees[None, :]).astype(np.float32)
        else:
            rng = np.random.default_rng(rng_seed) if random_mask else None
            out_degrees = _hidden_degrees(
                out_features, autoregressive_features, rng, int(in_degrees.min())
            )
            mask = (out_degrees[:, None] >= in_degrees[None, :]).astype(np.float32)
        lin = Linear.create(key, in_features, out_features, bias=bias, init="torch")
        return cls(
            weight=lin.weight,
            bias=lin.bias,
            mask=jnp.asarray(mask.T),  # stored (in, out) to match weight
            degrees=jnp.asarray(out_degrees),
        )

    def np_degrees(self):
        return np.asarray(self.degrees)

    def __call__(self, x):
        w = self.weight * self.mask
        if self.compute_dtype is not None:
            # end-to-end low-precision: activations STAY in compute_dtype
            # between layers (casting back to f32 per layer would keep the
            # HBM activation traffic at f32 and erase the benefit); the MADE
            # output is cast back where consumed
            dt = jnp.dtype(self.compute_dtype)
            y = jnp.dot(x.astype(dt), w.astype(dt))
            if self.bias is not None:
                y = y + self.bias.astype(dt)
            return y
        y = x @ w
        if self.bias is not None:
            y = y + self.bias
        return y

    def apply_t(self, x_t):
        """Transposed-layout forward: (in, B) -> (out, B).

        Same function as ``__call__`` on ``x_t.T`` but with zero layout
        changes — the batch stays on the minor (lane) axis end to end, which
        is what the planar spline kernel consumes (see
        ops/spline_pallas.py transposed path)."""
        w = (self.weight * self.mask).T  # (out, in)
        if self.compute_dtype is not None:
            dt = jnp.dtype(self.compute_dtype)
            y = jnp.dot(w.astype(dt), x_t.astype(dt))
            if self.bias is not None:
                y = y + self.bias.astype(dt)[:, None]
            return y
        y = w @ x_t
        if self.bias is not None:
            y = y + self.bias[:, None]
        return y

    def with_compute_dtype(self, dtype):
        return self.replace(compute_dtype=dtype)


def _act(name, x):
    if name == "relu":
        return jax.nn.relu(x)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "leaky_relu":
        return jax.nn.leaky_relu(x)
    raise NotImplementedError(f"activation {name}")


class MaskedFeedforwardBlock(Module):
    """Masked linear + activation (made.py:84-137); no context support."""

    linear: MaskedLinear
    activation: str = static_field(default="relu")
    dropout_probability: float = static_field(default=0.0)

    @classmethod
    def create(cls, key, in_degrees, autoregressive_features, random_mask=False,
               activation="relu", dropout_probability=0.0, rng_seed: int = 0):
        linear = MaskedLinear.create(
            key, in_degrees, len(in_degrees), autoregressive_features,
            random_mask=random_mask, is_output=False, rng_seed=rng_seed,
        )
        return cls(linear=linear, activation=activation,
                   dropout_probability=dropout_probability)

    @property
    def degrees(self):
        return self.linear.degrees

    def __call__(self, x, context=None, *, key=None, train=False):
        return _dropout(_act(self.activation, self.linear(x)),
                        self.dropout_probability, key, train)

    def apply_t(self, x_t, gate_t=None):
        # gate_t accepted for interface uniformity; feedforward blocks have
        # no context injection (matching the reference, made.py:84-137)
        return _act(self.activation, self.linear.apply_t(x_t))


class MaskedResidualBlock(Module):
    """Two masked linears with residual + GLU context injection (made.py:140-214)."""

    linear_0: MaskedLinear
    linear_1: MaskedLinear
    context_layer: Optional[Linear]
    activation: str = static_field(default="relu")
    dropout_probability: float = static_field(default=0.0)

    @classmethod
    def create(cls, key, in_degrees, autoregressive_features, context_features=None,
               activation="relu", dropout_probability=0.0,
               zero_initialization=True):
        k0, k1, kc, kz = jax.random.split(key, 4)
        linear_0 = MaskedLinear.create(
            k0, in_degrees, len(in_degrees), autoregressive_features, is_output=False
        )
        linear_1 = MaskedLinear.create(
            k1, linear_0.np_degrees(), len(in_degrees), autoregressive_features,
            is_output=False,
        )
        if not np.all(linear_1.np_degrees() >= np.asarray(in_degrees)):
            raise RuntimeError(
                "In a masked residual block, the output degrees can't be"
                " less than the corresponding input degrees."
            )
        if zero_initialization:
            f = len(in_degrees)
            w = jax.random.uniform(kz, (f, f), minval=-1e-3, maxval=1e-3)
            linear_1 = linear_1.replace(
                weight=w, bias=jax.random.uniform(kc, (f,), minval=-1e-3, maxval=1e-3)
            )
        ctx = (
            Linear.create(kc, context_features, len(in_degrees), init="torch")
            if context_features is not None
            else None
        )
        return cls(
            linear_0=linear_0, linear_1=linear_1, context_layer=ctx,
            activation=activation, dropout_probability=dropout_probability,
        )

    @property
    def degrees(self):
        return self.linear_1.degrees

    def __call__(self, x, context=None, *, key=None, train=False):
        temps = _act(self.activation, x)
        temps = self.linear_0(temps)
        temps = _act(self.activation, temps)
        temps = _dropout(temps, self.dropout_probability, key, train)
        temps = self.linear_1(temps)
        if context is not None and self.context_layer is not None:
            # torch F.glu(cat(a, b)) = a * sigmoid(b)
            gate = jax.nn.sigmoid(self.context_layer(context))
            temps = temps * gate.astype(temps.dtype)
        return x + temps

    def apply_t(self, x_t, gate_t=None):
        """Transposed residual block.  ``gate_t`` is the precomputed (H, B)
        GLU context gate (sigmoid of the context projection, transposed) —
        the context is constant across the sequential-inverse recursion, so
        callers compute it once via :meth:`MADE.context_cache_t` instead of
        re-projecting per pass."""
        temps = _act(self.activation, x_t)
        temps = self.linear_0.apply_t(temps)
        temps = _act(self.activation, temps)
        temps = self.linear_1.apply_t(temps)
        if gate_t is not None:
            temps = temps * gate_t.astype(temps.dtype)
        return x_t + temps


class MADE(Module):
    """MADE with residual or feedforward blocks (made.py:217-304)."""

    initial_layer: MaskedLinear
    context_layer: Optional[Linear]
    blocks: tuple
    final_layer: MaskedLinear
    preprocessing: Optional[Module]
    hidden_features: int = static_field(default=0)
    # feature positions sorted by autoregressive degree (argsort of the
    # possibly-permuted input degrees); the sliced sequential inverse
    # (flows/affine/autoregressive.py _inverse_sliced) indexes it with the
    # traced recursion step.  A BUFFER (not static): per-layer permutations
    # differ, and a static field would break the pytree homogeneity that
    # ScanChain / pipeline-parallel layer stacking require.
    input_order: Optional[jnp.ndarray] = buffer_field(default=None)

    @classmethod
    def create(
        cls,
        key,
        features: int,
        hidden_features: int,
        context_features=None,
        num_blocks: int = 2,
        output_multiplier: int = 1,
        use_residual_blocks: bool = True,
        random_mask: bool = False,
        permute_mask: bool = False,
        activation: str = "relu",
        dropout_probability: float = 0.0,
        use_batch_norm: bool = False,
        preprocessing=None,
        rng_seed: int = 0,
    ):
        _check_no_batch_norm(use_batch_norm)
        if use_residual_blocks and random_mask:
            raise ValueError("Residual blocks can't be used with random masks.")
        keys = jax.random.split(key, num_blocks + 3)
        input_degrees_ = _input_degrees(features)
        if permute_mask:
            rng = np.random.default_rng(rng_seed)
            input_degrees_ = input_degrees_[rng.permutation(features)]
        initial = MaskedLinear.create(
            keys[0], input_degrees_, hidden_features, features,
            random_mask=random_mask, is_output=False, rng_seed=rng_seed,
        )
        ctx = (
            Linear.create(keys[1], context_features, hidden_features, init="torch")
            if context_features is not None
            else None
        )
        blocks = []
        prev = initial.np_degrees()
        for i in range(num_blocks):
            if use_residual_blocks:
                block = MaskedResidualBlock.create(
                    keys[2 + i], prev, features, context_features=context_features,
                    activation=activation, dropout_probability=dropout_probability,
                )
            else:
                block = MaskedFeedforwardBlock.create(
                    keys[2 + i], prev, features, random_mask=random_mask,
                    activation=activation, dropout_probability=dropout_probability,
                    rng_seed=rng_seed + i + 1,
                )
            prev = block.linear.np_degrees() if not use_residual_blocks else (
                block.linear_1.np_degrees()
            )
            blocks.append(block)
        final = MaskedLinear.create(
            keys[-1], prev, features * output_multiplier, features,
            random_mask=random_mask, is_output=True, out_degrees_=input_degrees_,
        )
        return cls(
            initial_layer=initial,
            context_layer=ctx,
            blocks=tuple(blocks),
            final_layer=final,
            preprocessing=preprocessing,
            hidden_features=hidden_features,
            input_order=jnp.asarray(
                np.argsort(input_degrees_, kind="stable"), jnp.int32
            ),
        )

    def __call__(self, x, context=None, *, key=None, train=False):
        out = self.preprocessing(x) if self.preprocessing is not None else x
        from ..ops import backend, made_pallas

        if key is None and backend.made_fusion_enabled() and made_pallas.fusable(self, out, context):
            # fused Pallas path: whole masked MLP in one kernel, hidden
            # activations stay in VMEM (see ops/made_pallas.py)
            return made_pallas.made_apply_fused(self, out).astype(x.dtype)
        out = self.initial_layer(out)
        if context is not None and self.context_layer is not None:
            out = out + self.context_layer(context).astype(out.dtype)
        keys = (jax.random.split(key, len(self.blocks))
                if key is not None else [None] * len(self.blocks))
        for block, k in zip(self.blocks, keys):
            out = block(out, context, key=k, train=train)
        return self.final_layer(out).astype(x.dtype)

    def supports_t(self) -> bool:
        """Whether the transposed fast path applies (blocks with apply_t,
        preprocessing transposable).  Context is supported: its projections
        are constant across recursion passes and enter via
        :meth:`context_cache_t`."""
        if self.preprocessing is not None and not hasattr(
                self.preprocessing, "apply_t"):
            return False
        return all(hasattr(b, "apply_t") for b in self.blocks)

    def context_cache_t(self, context):
        """Precompute the transposed context terms for :meth:`apply_t`.

        The sequential AR inverse calls the net D times with the SAME
        context (reference autoregressive.py:29-38 recomputes the context
        projections every pass); here the initial-layer additive term and
        each residual block's GLU gate (made.py:258-276 semantics) are
        projected once — (H, B), batch on lanes — and reused in every pass.
        Returns None when there is nothing to cache."""
        if context is None or self.context_layer is None:
            return None
        # An unbatched 1-D context broadcasts over the batch in the general
        # path (Linear (C,) -> (H,), added over (B, H)); transposed that
        # must become an (H, 1) column or the (H, B) + (H,) add broadcasts
        # along the WRONG axis (silently, when B == H).
        context = jnp.atleast_2d(context)
        init_t = self.context_layer(context).T
        gates = tuple(
            jax.nn.sigmoid(b.context_layer(context)).T
            if getattr(b, "context_layer", None) is not None else None
            for b in self.blocks
        )
        return (init_t, gates)

    def apply_t(self, x_t, ctx_cache=None):
        """Transposed-layout forward: (F, B) -> (P, B), batch on the minor
        axis throughout — zero relayouts between the MADE matmuls and the
        planar spline kernel (the (B, S) <-> (S, B) transposes this avoids
        measured ~30 us each at flagship shapes; see docs/performance.md).
        ``ctx_cache`` is the output of :meth:`context_cache_t`."""
        out = (self.preprocessing.apply_t(x_t)
               if self.preprocessing is not None else x_t)
        out = self.initial_layer.apply_t(out)
        if ctx_cache is not None:
            out = out + ctx_cache[0].astype(out.dtype)
        gates = (ctx_cache[1] if ctx_cache is not None
                 else (None,) * len(self.blocks))
        for block, gate_t in zip(self.blocks, gates):
            out = block.apply_t(out, gate_t)
        return self.final_layer.apply_t(out).astype(x_t.dtype)
