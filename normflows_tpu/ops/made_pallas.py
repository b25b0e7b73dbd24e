"""Fused Pallas TPU kernel for the MADE residual MLP.

Motivation (measured on the flagship NSF-cylinder config, MADE hidden 512,
batch 2^14): the XLA path writes/reads every 512-wide hidden activation
tensor through HBM — ~360 MB of traffic per MADE pass for only ~18 GFLOP,
i.e. the pass is bandwidth-bound at <15% MXU utilization.  This kernel runs
the whole masked-MLP stack (initial masked linear, R masked residual blocks,
final masked linear) on one batch tile at a time with every hidden
activation living in VMEM; HBM traffic drops to the inputs, the (tiny)
weights, and the output parameters.

Semantics mirror ``nets/made.py`` (reference normflows/nets/made.py:217-304)
for the context-free case: masks are pre-multiplied into the weights by the
caller (a dense (W*mask) product is how the XLA path computes them too), so
the kernel itself is a plain residual MLP:

    h   = x @ W0 + b0
    for r in range(R):
        t = act(h); t = t @ W1[r] + b1[r]; t = act(t); t = t @ W2[r] + b2[r]
        h = h + t
    out = h @ Wf + bf

Autodiff: the backward pass is ALSO a fused Pallas kernel — the forward
block math is pulled back with ``jax.vjp`` *inside* the kernel body (same
pattern as ops/spline_pallas.py), recomputing the hidden activations in
VMEM instead of storing them.  Weight gradients are accumulated across
batch-tile grid steps into revisited output blocks (TPU grids run
sequentially, so read-modify-write is safe).

Shape contract (enforced by the caller / ``fusable``):
  x (B, F) f32 with B % TILE_B == 0;  W0 (F, H);  W1s/W2s (R, H, H);
  Wf (H, P) with H % 128 == 0 and P % 128 == 0; biases broadcast as (1, H) /
  (R, 1, H) / (1, P).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 256  # batch rows per grid step (VMEM: ~6 f32 (TILE_B, 512) live)
TILE_B_FWD = 2048  # forward keeps ~3 (TILE_B, H) tensors live
TILE_B_BWD = 512   # backward (vjp recompute) keeps ~8 live


def _act(name, x):
    if name == "relu":
        return jax.nn.relu(x)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "leaky_relu":
        return jax.nn.leaky_relu(x)
    raise NotImplementedError(f"activation {name}")


def _mlp_block(x, w0, b0, w1s, b1s, w2s, b2s, wf, bf, *, R, activation,
               compute_dtype=None):
    """Residual-MLP forward on one batch tile; differentiable (used under
    jax.vjp inside the backward kernel).

    Mixed precision: with ``compute_dtype='bfloat16'`` the weights arrive
    bf16 and each matmul operand is cast to bf16 (MXU native rate) with f32
    accumulation; activations/biases stay f32 in VMEM — strictly *more*
    accurate than the XLA bf16 path (which keeps activations bf16 in HBM),
    at zero HBM cost since everything lives in VMEM here.
    """
    f32 = jnp.float32
    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else None

    def mm(a, w):
        if cd is not None:
            a = a.astype(cd)
        return jnp.dot(a, w, preferred_element_type=f32)

    h = mm(x, w0) + b0[0]
    for r in range(R):
        t = _act(activation, h)
        t = mm(t, w1s[r]) + b1s[r, 0]
        t = _act(activation, t)
        t = mm(t, w2s[r]) + b2s[r, 0]
        h = h + t
    return mm(h, wf) + bf[0]


def _fwd_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                wf_ref, bf_ref, out_ref, *, R, activation, compute_dtype):
    out_ref[:] = _mlp_block(
        x_ref[:], w0_ref[:], b0_ref[:], w1_ref[:], b1_ref[:], w2_ref[:],
        b2_ref[:], wf_ref[:], bf_ref[:], R=R, activation=activation,
        compute_dtype=compute_dtype,
    )


def _acc(ref, val):
    """Initialize-then-accumulate a revisited output block across grid steps.

    The constant output index map keeps the block VMEM-resident for the whole
    grid, so this is a VMEM read-modify-write; accumulation is in the ref's
    dtype (f32 — see ``_vjp_bwd``) regardless of compute dtype.
    """
    first = pl.program_id(0) == 0
    val = val.astype(ref.dtype)

    @pl.when(first)
    def _():
        ref[:] = val

    @pl.when(jnp.logical_not(first))
    def _():
        ref[:] = ref[:] + val


def _bwd_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                wf_ref, bf_ref, g_ref,
                dx_ref, dw0_ref, db0_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dwf_ref, dbf_ref, *, R, activation, compute_dtype):
    def f(x, w0, b0, w1s, b1s, w2s, b2s, wf, bf):
        return _mlp_block(x, w0, b0, w1s, b1s, w2s, b2s, wf, bf,
                          R=R, activation=activation,
                          compute_dtype=compute_dtype)

    _, vjp_fn = jax.vjp(
        f, x_ref[:], w0_ref[:], b0_ref[:], w1_ref[:], b1_ref[:], w2_ref[:],
        b2_ref[:], wf_ref[:], bf_ref[:],
    )
    dx, dw0, db0, dw1, db1, dw2, db2, dwf, dbf = vjp_fn(g_ref[:])
    dx_ref[:] = dx.astype(dx_ref.dtype)
    for ref, val in (
        (dw0_ref, dw0), (db0_ref, db0), (dw1_ref, dw1), (db1_ref, db1),
        (dw2_ref, dw2), (db2_ref, db2), (dwf_ref, dwf), (dbf_ref, dbf),
    ):
        _acc(ref, val)


def _full(shape):
    """BlockSpec for a weight that is the whole array every grid step (the
    constant index map lets Pallas keep it resident in VMEM)."""
    zeros = (0,) * len(shape)
    return pl.BlockSpec(shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)


def _tiled(cols, tile_b):
    return pl.BlockSpec((tile_b, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _weight_specs(F, H, R, P):
    return [
        _full((F, H)), _full((1, H)),
        _full((R, H, H)), _full((R, 1, H)),
        _full((R, H, H)), _full((R, 1, H)),
        _full((H, P)), _full((1, P)),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_resmade(x, w0, b0, w1s, b1s, w2s, b2s, wf, bf,
                  activation="relu", interpret=False, compute_dtype=None):
    """Fused residual-MADE MLP: (B, F) -> (B, P); see module docstring."""
    return _fwd_impl(x, w0, b0, w1s, b1s, w2s, b2s, wf, bf, activation,
                     interpret, compute_dtype)


def _fwd_impl(x, w0, b0, w1s, b1s, w2s, b2s, wf, bf, activation, interpret,
              compute_dtype):
    B, F = x.shape
    H = w0.shape[1]
    R = w1s.shape[0]
    P = wf.shape[1]
    kernel = functools.partial(_fwd_kernel, R=R, activation=activation,
                               compute_dtype=compute_dtype)
    tb = min(TILE_B_FWD, B)
    return pl.pallas_call(
        kernel,
        grid=(B // tb,),
        in_specs=[_tiled(F, tb)] + _weight_specs(F, H, R, P),
        out_specs=_tiled(P, tb),
        out_shape=jax.ShapeDtypeStruct((B, P), jnp.float32),
        interpret=interpret,
    )(x, w0, b0, w1s, b1s, w2s, b2s, wf, bf)


def _vjp_fwd(x, w0, b0, w1s, b1s, w2s, b2s, wf, bf, activation, interpret,
             compute_dtype):
    out = _fwd_impl(x, w0, b0, w1s, b1s, w2s, b2s, wf, bf, activation,
                    interpret, compute_dtype)
    return out, (x, w0, b0, w1s, b1s, w2s, b2s, wf, bf)


def _vjp_bwd(activation, interpret, compute_dtype, res, g):
    x, w0, b0, w1s, b1s, w2s, b2s, wf, bf = res
    B, F = x.shape
    H = w0.shape[1]
    R = w1s.shape[0]
    P = wf.shape[1]
    kernel = functools.partial(_bwd_kernel, R=R, activation=activation,
                               compute_dtype=compute_dtype)
    tb = min(TILE_B_BWD, B)
    shapes = [x, w0, b0, w1s, b1s, w2s, b2s, wf, bf]
    out_specs = ([_tiled(F, tb)]
                 + _weight_specs(F, H, R, P))
    # weight/bias grads accumulate across grid steps — keep those refs f32
    # (VMEM-resident via the constant index map) and cast back to the primal
    # dtypes afterwards
    grads = pl.pallas_call(
        kernel,
        grid=(B // tb,),
        in_specs=[_tiled(F, tb)] + _weight_specs(F, H, R, P) + [_tiled(P, tb)],
        out_specs=tuple(out_specs),
        out_shape=tuple(
            [jax.ShapeDtypeStruct(x.shape, x.dtype)]
            + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in shapes[1:]]
        ),
        interpret=interpret,
    )(x, w0, b0, w1s, b1s, w2s, b2s, wf, bf, g)
    return tuple(
        gr.astype(a.dtype) for gr, a in zip(grads, shapes)
    )


fused_resmade.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# MADE glue: pack a nets.made.MADE pytree into the fused call
# --------------------------------------------------------------------------

def fusable(made, x, context) -> bool:
    """True when ``made``/``x`` fit the fused kernel's fast path."""
    from ..nets.made import MaskedResidualBlock

    if context is not None or made.context_layer is not None:
        return False
    if x.ndim != 2 or x.dtype != jnp.float32:
        return False
    if x.shape[0] < TILE_B:  # tiny batches: the XLA path is fine
        return False
    blocks = made.blocks
    if not blocks:
        return False
    cd = made.initial_layer.compute_dtype
    if cd not in (None, "bfloat16"):
        return False
    for blk in blocks:
        if not isinstance(blk, MaskedResidualBlock):
            return False
        if blk.context_layer is not None:
            return False
        if blk.activation != blocks[0].activation:
            return False
        if blk.linear_0.compute_dtype != cd or blk.linear_1.compute_dtype != cd:
            return False
        if blk.linear_0.bias is None or blk.linear_1.bias is None:
            return False
    lin = made.initial_layer
    if lin.bias is None:
        return False
    fin = made.final_layer
    if fin.compute_dtype != cd or fin.bias is None:
        return False
    H = lin.weight.shape[1]
    if H % 128 != 0:
        return False
    # VMEM budget: weights + grads must fit beside the batch tiles
    R = len(blocks)
    if R * 2 * H * H * 4 > 8 * 2 ** 20:
        return False
    return True


def _round_up(n, m):
    return (n + m - 1) // m * m


def made_apply_fused(made, x, interpret=False):
    """Run a context-free residual MADE through the fused kernel.

    ``x`` is the post-preprocessing input; the caller checked ``fusable``.
    Mask pre-multiplication, batch/param padding, and output slicing happen
    here as traced (cheap, fully-fused) XLA ops around the custom-vjp core.
    """
    B, F = x.shape
    lin = made.initial_layer
    fin = made.final_layer
    blocks = made.blocks
    H = lin.weight.shape[1]
    P = fin.weight.shape[1]
    cd = lin.compute_dtype  # None or "bfloat16" (checked by `fusable`)

    def w(layer):
        m = layer.weight * layer.mask
        return m.astype(jnp.dtype(cd)) if cd is not None else m

    w0 = w(lin)
    b0 = lin.bias.reshape(1, H)
    w1s = jnp.stack([w(b.linear_0) for b in blocks])
    b1s = jnp.stack([b.linear_0.bias.reshape(1, H) for b in blocks])
    w2s = jnp.stack([w(b.linear_1) for b in blocks])
    b2s = jnp.stack([b.linear_1.bias.reshape(1, H) for b in blocks])
    wf = w(fin)
    bf = fin.bias.reshape(1, P)

    Bp = _round_up(B, max(TILE_B_FWD, TILE_B_BWD))
    Pp = _round_up(P, 128)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    if Pp != P:
        wf = jnp.pad(wf, ((0, 0), (0, Pp - P)))
        bf = jnp.pad(bf, ((0, 0), (0, Pp - P)))

    out = fused_resmade(x, w0, b0, w1s, b1s, w2s, b2s, wf, bf,
                        blocks[0].activation, interpret, cd)
    return out[:B, :P]
