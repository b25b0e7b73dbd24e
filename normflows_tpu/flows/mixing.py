"""Permutations and invertible linear flows (reference: normflows/flows/mixing.py).

TPU-first change: the reference inverts the assembled Glow 1x1-conv weight with
a float64 dense inverse every step (mixing.py:94-101).  Here the LU path never
forms an explicit inverse — forward applies two *triangular solves* in f32
(numerically stable, MXU/VPU-friendly, no f64 emulation), and the log-det reads
off the diagonal in O(C).  The 1x1 convolution itself is an einsum over the
channel axis, which XLA maps to a batched matmul on the MXU.

The reference's ``_Linear``/``_LinearCache`` eval-mode weight/inverse/logdet
cache (mixing.py:257-365) has no counterpart here by design: under ``jit``,
XLA common-subexpression-eliminates and hoists the weight assembly, which is
exactly what the cache hand-implements for eager torch.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module, static_field, buffer_field
from ..core.flow import Flow, zero_log_det_like_z


class Permute(Flow):
    """Channel permutation: 'shuffle' (fixed random) or 'swap' (mixing.py:9-54)."""

    perm: Optional[jnp.ndarray] = buffer_field(default=None)
    inv_perm: Optional[jnp.ndarray] = buffer_field(default=None)
    num_channels: int = static_field(default=2)
    mode: str = static_field(default="shuffle")

    @classmethod
    def create(cls, num_channels, mode="shuffle", key=None, seed: int = 0):
        perm = inv_perm = None
        if mode == "shuffle":
            if key is None:
                key = jax.random.key(seed)
            perm = jax.random.permutation(key, num_channels)
            inv_perm = jnp.argsort(perm)
        return cls(perm=perm, inv_perm=inv_perm, num_channels=num_channels, mode=mode)

    def forward(self, z, context=None, *, key=None):
        if self.mode == "shuffle":
            z = jnp.take(z, self.perm, axis=1)
        elif self.mode == "swap":
            z1 = z[:, : self.num_channels // 2, ...]
            z2 = z[:, self.num_channels // 2 :, ...]
            z = jnp.concatenate([z2, z1], axis=1)
        else:
            raise NotImplementedError(f"The mode {self.mode} is not implemented.")
        return z, zero_log_det_like_z(z)

    def inverse(self, z, context=None, *, key=None):
        if self.mode == "shuffle":
            z = jnp.take(z, self.inv_perm, axis=1)
        elif self.mode == "swap":
            z1 = z[:, : (self.num_channels + 1) // 2, ...]
            z2 = z[:, (self.num_channels + 1) // 2 :, ...]
            z = jnp.concatenate([z2, z1], axis=1)
        else:
            raise NotImplementedError(f"The mode {self.mode} is not implemented.")
        return z, zero_log_det_like_z(z)


def _qr_init(key, n):
    Q, _ = jnp.linalg.qr(jax.random.normal(key, (n, n)))
    return Q


def _lu_unpack(Q):
    """P, L (unit-lower), U from an (orthogonal) matrix, host-side numpy."""
    import scipy.linalg

    P, L, U = scipy.linalg.lu(np.asarray(Q))
    return jnp.asarray(P), jnp.asarray(L), jnp.asarray(U)


def _channel_matmul(W, z):
    """Apply (C, C) matrix over channel axis of NCHW or NC tensors."""
    if z.ndim == 2:
        return z @ W.T
    return jnp.einsum("ij,bj...->bi...", W, z)


def _tri_solve_channel(L, U, z):
    """Solve (L @ U) x = z over the channel axis (NCHW or NC)."""
    if z.ndim == 2:
        rhs = z.T  # (C, B)
    else:
        b = z.shape[0]
        rhs = jnp.moveaxis(z, 1, 0).reshape(z.shape[1], -1)  # (C, B*H*W)
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True, unit_diagonal=True)
    x = jax.scipy.linalg.solve_triangular(U, y, lower=False)
    if z.ndim == 2:
        return x.T
    out = x.reshape(z.shape[1], z.shape[0], *z.shape[2:])
    return jnp.moveaxis(out, 0, 1)


class _LUConvBase(Flow):
    """Shared LU / dense invertible linear machinery (mixing.py:57-207).

    forward (sampling direction) applies W^{-1}; inverse applies W — matching
    the reference where `inverse` is the density direction used with images.
    """

    W: Optional[jnp.ndarray] = None
    P: Optional[jnp.ndarray] = buffer_field(default=None)
    L: Optional[jnp.ndarray] = None
    U: Optional[jnp.ndarray] = None
    sign_S: Optional[jnp.ndarray] = buffer_field(default=None)
    log_S: Optional[jnp.ndarray] = None
    num_channels: int = static_field(default=2)
    use_lu: bool = static_field(default=False)

    @classmethod
    def create(cls, num_channels, use_lu=False, key=None, seed: int = 0):
        if key is None:
            key = jax.random.key(seed)
        Q = _qr_init(key, num_channels)
        if use_lu:
            P, L, U = _lu_unpack(Q)
            S = jnp.diag(U)
            return cls(
                P=P,
                L=L,
                sign_S=jnp.sign(S),
                log_S=jnp.log(jnp.abs(S)),
                U=jnp.triu(U, k=1),
                num_channels=num_channels,
                use_lu=use_lu,
            )
        return cls(W=Q, num_channels=num_channels, use_lu=use_lu)

    def _lu_factors(self):
        eye = jnp.eye(self.num_channels, dtype=self.L.dtype)
        L = jnp.tril(self.L, k=-1) + eye
        U = jnp.triu(self.U, k=1) + jnp.diag(self.sign_S * jnp.exp(self.log_S))
        return L, U

    def _spatial(self, z):
        n = 1
        for s in z.shape[2:]:
            n *= s
        return float(n)

    def _apply_forward(self, z):
        """Apply W^{-1} (sampling direction)."""
        if self.use_lu:
            L, U = self._lu_factors()
            # W = P L U  =>  W^{-1} z = U^{-1} L^{-1} P^T z
            z = _channel_matmul(self.P.T, z)
            z_ = _tri_solve_channel(L, U, z)
            log_det = -jnp.sum(self.log_S)
        else:
            W_inv = jnp.linalg.inv(self.W)
            z_ = _channel_matmul(W_inv, z)
            log_det = -jnp.linalg.slogdet(self.W)[1]
        return z_, log_det * self._spatial(z_)

    def _apply_inverse(self, z):
        """Apply W (density direction)."""
        if self.use_lu:
            L, U = self._lu_factors()
            W = self.P @ L @ U
            log_det = jnp.sum(self.log_S)
        else:
            W = self.W
            log_det = jnp.linalg.slogdet(self.W)[1]
        z_ = _channel_matmul(W, z)
        return z_, log_det * self._spatial(z_)


class Invertible1x1Conv(_LUConvBase):
    """Glow invertible 1x1 convolution on NCHW tensors (mixing.py:57-133)."""

    def forward(self, z, context=None, *, key=None):
        z_, log_det = self._apply_forward(z)
        return z_, jnp.full(z.shape[0], log_det)

    def inverse(self, z, context=None, *, key=None):
        z_, log_det = self._apply_inverse(z)
        return z_, jnp.full(z.shape[0], log_det)


class InvertibleAffine(_LUConvBase):
    """1-D invertible linear transform (mixing.py:136-207).

    Note the reference applies ``z @ W`` (right-multiplication); we match via
    the transpose so densities agree.
    """

    @classmethod
    def create(cls, num_channels, use_lu=True, key=None, seed: int = 0):
        return super().create(num_channels, use_lu=use_lu, key=key, seed=seed)

    def forward(self, z, context=None, *, key=None):
        if self.use_lu:
            L, U = self._lu_factors()
            # z @ W^{-1} with W = P L U: (W^{-1})^T = P (L U)^{-T}
            # solve (LU)^T x^T ... simpler: z @ W^{-1} = ((P L U)^{-1} applied on right)
            W = self.P @ L @ U
            z_ = jnp.linalg.solve(W.T, z.T).T
            log_det = -jnp.sum(self.log_S)
        else:
            z_ = jnp.linalg.solve(self.W.T, z.T).T
            log_det = -jnp.linalg.slogdet(self.W)[1]
        return z_, jnp.full(z.shape[0], log_det)

    def inverse(self, z, context=None, *, key=None):
        if self.use_lu:
            L, U = self._lu_factors()
            W = self.P @ L @ U
            log_det = jnp.sum(self.log_S)
        else:
            W = self.W
            log_det = jnp.linalg.slogdet(self.W)[1]
        return z @ W, jnp.full(z.shape[0], log_det)


class _LULinear(Flow):
    """LU-parameterized dense linear bijector with bias (mixing.py:368-532).

    forward = apply W = L U (+ bias), density direction in LULinearPermute;
    inverse = two triangular solves.  Identity init via softplus diagonal.
    """

    lower_entries: jnp.ndarray
    upper_entries: jnp.ndarray
    unconstrained_upper_diag: jnp.ndarray
    bias: jnp.ndarray
    features: int = static_field(default=2)
    eps: float = static_field(default=1e-3)

    @classmethod
    def create(cls, features, identity_init=True, eps=1e-3, key=None, seed: int = 0):
        n_tri = ((features - 1) * features) // 2
        if identity_init:
            lower = jnp.zeros(n_tri)
            upper = jnp.zeros(n_tri)
            diag = jnp.full(features, float(np.log(np.exp(1 - eps) - 1)))
        else:
            if key is None:
                key = jax.random.key(seed)
            k1, k2, k3 = jax.random.split(key, 3)
            stdv = 1.0 / np.sqrt(features)
            lower = jax.random.uniform(k1, (n_tri,), minval=-stdv, maxval=stdv)
            upper = jax.random.uniform(k2, (n_tri,), minval=-stdv, maxval=stdv)
            diag = jax.random.uniform(k3, (features,), minval=-stdv, maxval=stdv)
        return cls(
            lower_entries=lower,
            upper_entries=upper,
            unconstrained_upper_diag=diag,
            bias=jnp.zeros(features),
            features=features,
            eps=eps,
        )

    def _lower_upper(self):
        n = self.features
        li = np.tril_indices(n, k=-1)
        ui = np.triu_indices(n, k=1)
        lower = jnp.zeros((n, n)).at[li].set(self.lower_entries) + jnp.eye(n)
        upper = jnp.zeros((n, n)).at[ui].set(self.upper_entries) + jnp.diag(
            self.upper_diag
        )
        return lower, upper

    @property
    def upper_diag(self):
        return jax.nn.softplus(self.unconstrained_upper_diag) + self.eps

    def logabsdet(self):
        return jnp.sum(jnp.log(self.upper_diag))

    def forward(self, z, context=None, *, key=None):
        """outputs = L (U z) + bias — torch F.linear(x, W) = x @ W.T."""
        lower, upper = self._lower_upper()
        out = z @ upper.T
        out = out @ lower.T + self.bias
        return out, jnp.full(z.shape[0], self.logabsdet())

    def inverse(self, z, context=None, *, key=None):
        lower, upper = self._lower_upper()
        rhs = (z - self.bias).T
        y = jax.scipy.linalg.solve_triangular(lower, rhs, lower=True, unit_diagonal=True)
        x = jax.scipy.linalg.solve_triangular(upper, y, lower=False)
        return x.T, jnp.full(z.shape[0], -self.logabsdet())


class _Permutation(Flow):
    """Fixed index permutation on a given axis (mixing.py:213-247)."""

    permutation: jnp.ndarray = buffer_field()
    dim: int = static_field(default=1)

    def forward(self, z, context=None, *, key=None):
        z = jnp.take(z, self.permutation, axis=self.dim)
        return z, zero_log_det_like_z(z)

    def inverse(self, z, context=None, *, key=None):
        z = jnp.take(z, jnp.argsort(self.permutation), axis=self.dim)
        return z, zero_log_det_like_z(z)


class _RandomPermutation(_Permutation):
    @classmethod
    def create(cls, features, dim=1, key=None, seed: int = 0):
        if key is None:
            key = jax.random.key(seed)
        return cls(permutation=jax.random.permutation(key, features), dim=dim)


class LULinearPermute(Flow):
    """Fixed permutation + LU linear, as in NSF models (mixing.py:535-563)."""

    permutation: _RandomPermutation
    linear: _LULinear

    @classmethod
    def create(cls, num_channels, identity_init=True, key=None, seed: int = 0):
        if key is None:
            key = jax.random.key(seed)
        kp, kl = jax.random.split(key)
        return cls(
            permutation=_RandomPermutation.create(num_channels, key=kp),
            linear=_LULinear.create(num_channels, identity_init=identity_init, key=kl),
        )

    def forward(self, z, context=None, *, key=None):
        z, log_det = self.linear.inverse(z, context)
        z, _ = self.permutation.inverse(z, context)
        return z, log_det

    def inverse(self, z, context=None, *, key=None):
        z, _ = self.permutation.forward(z, context)
        z, log_det = self.linear.forward(z, context)
        return z, log_det
