"""Affine coupling flows (reference: normflows/flows/affine/coupling.py:9-267)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Module, static_field, buffer_field
from ...core.flow import Flow, sum_except_batch, zero_log_det_like_z
from ..reshape import Split, Merge


class AffineConstFlow(Flow):
    """Learned per-dim scale & shift: z' = z*exp(s) + t (coupling.py:9-54).

    ``s``/``t`` broadcast against the event; log-det multiplies by the number
    of broadcast (spatial) positions, as in coupling.py:44-53.
    """

    s: Optional[jnp.ndarray]
    t: Optional[jnp.ndarray]

    @classmethod
    def create(cls, shape, scale: bool = True, shift: bool = True):
        if isinstance(shape, int):
            shape = (shape,)
        s = jnp.zeros((1, *shape)) if scale else None
        t = jnp.zeros((1, *shape)) if shift else None
        return cls(s=s, t=t)

    def _s(self, z):
        return jnp.zeros((1,) * z.ndim, z.dtype) if self.s is None else self.s

    def _t(self, z):
        return jnp.zeros((1,) * z.ndim, z.dtype) if self.t is None else self.t

    def _n_broadcast(self, z):
        s = self._s(z)
        n = 1
        for zi, si in zip(z.shape[1:], s.shape[1:]):
            if si == 1:
                n *= zi
        return float(n)

    def forward(self, z, context=None, *, key=None):
        s, t = self._s(z), self._t(z)
        z_ = z * jnp.exp(s) + t
        log_det = self._n_broadcast(z) * jnp.sum(s) * jnp.ones(z.shape[0], z.dtype)
        return z_, log_det

    def inverse(self, z, context=None, *, key=None):
        s, t = self._s(z), self._t(z)
        z_ = (z - t) * jnp.exp(-s)
        log_det = -self._n_broadcast(z) * jnp.sum(s) * jnp.ones(z.shape[0], z.dtype)
        return z_, log_det


class CCAffineConst(Flow):
    """Class-conditional affine const flow (coupling.py:57-96).

    Per-class scale/shift offsets applied via one-hot matmul.
    """

    s: jnp.ndarray
    t: jnp.ndarray
    s_cc: jnp.ndarray  # (num_classes, prod(shape))
    t_cc: jnp.ndarray
    shape: tuple = static_field()

    @classmethod
    def create(cls, shape, num_classes: int):
        if isinstance(shape, int):
            shape = (shape,)
        import numpy as np

        d = int(np.prod(shape))
        return cls(
            s=jnp.zeros((1, *shape)),
            t=jnp.zeros((1, *shape)),
            s_cc=jnp.zeros((num_classes, d)),
            t_cc=jnp.zeros((num_classes, d)),
            shape=tuple(shape),
        )

    def forward(self, z, y, *, key=None):
        s = self.s + (y @ self.s_cc).reshape(y.shape[0], *self.shape)
        t = self.t + (y @ self.t_cc).reshape(y.shape[0], *self.shape)
        z_ = z * jnp.exp(s) + t
        log_det = sum_except_batch(s)
        return z_, log_det

    def inverse(self, z, y, *, key=None):
        s = self.s + (y @ self.s_cc).reshape(y.shape[0], *self.shape)
        t = self.t + (y @ self.t_cc).reshape(y.shape[0], *self.shape)
        z_ = (z - t) * jnp.exp(-s)
        log_det = -sum_except_batch(s)
        return z_, log_det


def _affine_from_params(param, scale: bool, scale_map: str):
    """Split param-net output into (shift, scale) via channel interleave.

    Matches coupling.py:129-140: shift = param[:, 0::2], scale_ = param[:, 1::2]
    (interleave on axis 1 — channel axis for NCHW, feature axis for 2-D).
    """
    if scale:
        shift = param[:, 0::2, ...]
        scale_ = param[:, 1::2, ...]
        if scale_map == "exp":
            return shift, scale_, "exp"
        elif scale_map == "sigmoid":
            # Glow: scale factor = sigmoid(s + 2); z2 /= factor in forward
            return shift, jnp.log(jax.nn.sigmoid(scale_ + 2.0)), "sigmoid"
        elif scale_map == "sigmoid_inv":
            return shift, jnp.log(jax.nn.sigmoid(scale_ + 2.0)), "sigmoid_inv"
        else:
            raise NotImplementedError(f"scale map {scale_map}")
    else:
        return param, None, "none"


class AffineCoupling(Flow):
    """RealNVP-style coupling on a pre-split pair [z1, z2] (coupling.py:99-171).

    forward: z2' = z2 * exp(s(z1)) + t(z1)  (scale_map='exp')
    Glow's 'sigmoid' map divides by sigmoid(s+2) instead (coupling.py:135-141);
    both are expressed here via a single log-scale so the fused TPU kernel path
    (ops/) sees one canonical form.
    """

    param_map: Module
    scale: bool = static_field(default=True)
    scale_map: str = static_field(default="exp")

    def _params(self, z1, context=None):
        # the reference's AffineCoupling is unconditional (coupling.py:117-151);
        # context is accepted for interface uniformity and ignored
        param = self.param_map(z1)
        shift, log_scale, kind = _affine_from_params(param, self.scale, self.scale_map)
        return shift, log_scale, kind

    def forward(self, zpair, context=None, *, key=None):
        z1, z2 = zpair
        shift, log_scale, kind = self._params(z1, context)
        if log_scale is None:
            z2 = z2 + shift
            log_det = jnp.zeros(z1.shape[0], z1.dtype)
        elif kind == "sigmoid":
            # z2 = z2 / factor + shift ; log_det = -sum log factor
            z2 = z2 * jnp.exp(-log_scale) + shift
            log_det = -sum_except_batch(log_scale)
        else:  # exp / sigmoid_inv: z2 = z2 * scale + shift
            z2 = z2 * jnp.exp(log_scale) + shift
            log_det = sum_except_batch(log_scale)
        return [z1, z2], log_det

    def inverse(self, zpair, context=None, *, key=None):
        z1, z2 = zpair
        shift, log_scale, kind = self._params(z1, context)
        if log_scale is None:
            z2 = z2 - shift
            log_det = jnp.zeros(z1.shape[0], z1.dtype)
        elif kind == "sigmoid":
            z2 = (z2 - shift) * jnp.exp(log_scale)
            log_det = sum_except_batch(log_scale)
        else:
            z2 = (z2 - shift) * jnp.exp(-log_scale)
            log_det = -sum_except_batch(log_scale)
        return [z1, z2], log_det


class MaskedAffineFlow(Flow):
    """Mask-based RealNVP layer (coupling.py:174-229).

    f(z) = b*z + (1-b) * (z * exp(s(b*z)) + t(b*z)); NaN-guard via
    ``jnp.where(isfinite, ., 0)`` mirrors coupling.py:212-215.
    """

    b: jnp.ndarray = buffer_field()
    t_net: Optional[Module]
    s_net: Optional[Module]

    @classmethod
    def create(cls, b, t=None, s=None):
        return cls(b=jnp.asarray(b), t_net=t, s_net=s)

    def _st(self, z_masked, context):
        # unconditional in the reference (coupling.py:209-226); context ignored
        def call(net):
            if net is None:
                return jnp.zeros_like(z_masked)
            out = net(z_masked)
            return jnp.where(jnp.isfinite(out), out, jnp.zeros_like(out))

        return call(self.s_net), call(self.t_net)

    def forward(self, z, context=None, *, key=None):
        z_masked = self.b * z
        scale, trans = self._st(z_masked, context)
        z_ = z_masked + (1 - self.b) * (z * jnp.exp(scale) + trans)
        log_det = sum_except_batch((1 - self.b) * scale)
        return z_, log_det

    def inverse(self, z, context=None, *, key=None):
        z_masked = self.b * z
        scale, trans = self._st(z_masked, context)
        z_ = z_masked + (1 - self.b) * (z - trans) * jnp.exp(-scale)
        log_det = -sum_except_batch((1 - self.b) * scale)
        return z_, log_det


class AffineCouplingBlock(Flow):
    """Split -> AffineCoupling -> Merge composite (coupling.py:232-267)."""

    split: Split
    coupling: AffineCoupling
    merge: Merge

    @classmethod
    def create(cls, param_map, scale=True, scale_map="exp", split_mode="channel"):
        return cls(
            split=Split(mode=split_mode),
            coupling=AffineCoupling(param_map=param_map, scale=scale, scale_map=scale_map),
            merge=Merge(mode=split_mode),
        )

    def forward(self, z, context=None, *, key=None):
        zpair, ld0 = self.split.forward(z)
        zpair, ld1 = self.coupling.forward(zpair, context)
        z, ld2 = self.merge.forward(zpair)
        return z, ld0 + ld1 + ld2

    def inverse(self, z, context=None, *, key=None):
        zpair, ld0 = self.merge.inverse(z)
        zpair, ld1 = self.coupling.inverse(zpair, context)
        z, ld2 = self.split.inverse(zpair)
        return z, ld0 + ld1 + ld2
