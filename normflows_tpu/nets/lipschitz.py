"""Lipschitz-constrained networks via spectral normalization
(reference: normflows/nets/lipschitz.py, from rtqichen/residual-flows).

TPU-first re-design notes:
  * `InducedNormLinear` AND `InducedNormConv2d` support any fixed induced
    (domain, codomain) norm order — p=2 via L2 power iteration, p=1 / inf
    via projmax, general p via the dual-norm maximizer steps
    (lipschitz.py:659-689); only the reference's LEARNABLE-ord mode is out
    of scope (its public nets never instantiate it — see PARITY.md for the
    reachability argument).  Power iteration is a pure function returning
    an updated module (u/v/scale are buffers), mirroring the reference's
    train-loop `update_lipschitz` (utils/optim.py:28-31) rather than hidden
    in-forward mutation.
  * The conv power iteration runs through `lax.conv` / `conv_transpose`
    (lipschitz.py:553-610); spatial dims are fixed at construction instead of
    lazily on first forward (lipschitz.py:612-616) — static shapes for XLA.
  * ``sigma = u . (W v)`` keeps the soft-normalization factor differentiable
    w.r.t. the raw weight (lipschitz.py:267-269).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module, static_field, buffer_field


class Swish(Module):
    """x * sigmoid(softplus(beta) * x) / 1.1 with learnable beta (lipschitz.py:642-647)."""

    beta: jnp.ndarray

    @classmethod
    def create(cls):
        return cls(beta=jnp.array([0.5]))

    def __call__(self, x):
        return x * jax.nn.sigmoid(x * jax.nn.softplus(self.beta)) / 1.1


def _normalize(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def _check_p2(domain, codomain):
    """Validate induced-norm orders: fixed p in [1, inf] both sides.

    The reference additionally supports LEARNABLE orders (a tensor wrapped
    in asym_squash, lipschitz.py:206-213) — its public nets never
    instantiate that, and a trainable norm order has no pytree slot here,
    so learnable ords remain out of scope (documented deviation)."""
    for p in (domain, codomain):
        if not isinstance(p, (int, float)) or not (1 <= p):
            raise NotImplementedError(
                f"induced-norm order must be a fixed float >= 1, got {p!r}"
                " (the reference's learnable-ord mode is out of scope)"
            )


def _projmax(x):
    """Argmax one-hot times sign (reference projmax_, lipschitz.py:651-657)."""
    idx = jnp.argmax(jnp.abs(x))
    return jnp.zeros_like(x).at[idx].set(jnp.sign(x[idx]))


def _pnorm(x, p):
    return jnp.sum(jnp.abs(x) ** p) ** (1.0 / p)


def _normalize_v(v, domain, eps=1e-12):
    """Dual-norm maximizer step for the input side (lipschitz.py:659-671)."""
    if domain == 2:
        return _normalize(v, eps)
    if domain == 1:
        return _projmax(v)
    vabs = jnp.abs(v)
    vph = jnp.where(vabs == 0, 1.0, jnp.sign(v))
    vabs = vabs / jnp.maximum(jnp.max(vabs), eps)
    vabs = vabs ** (1.0 / (domain - 1))
    return vph * vabs / jnp.maximum(_pnorm(vabs, domain), eps)


def _normalize_u(u, codomain, eps=1e-12):
    """Dual-norm maximizer step for the output side (lipschitz.py:674-689)."""
    if codomain == 2:
        return _normalize(u, eps)
    if codomain == float("inf"):
        return _projmax(u)
    uabs = jnp.abs(u)
    uph = jnp.where(uabs == 0, 1.0, jnp.sign(u))
    uabs = uabs / jnp.maximum(jnp.max(uabs), eps)
    uabs = uabs ** (codomain - 1)
    if codomain == 1:
        return uph * uabs / jnp.maximum(jnp.max(uabs), eps)
    q = codomain / (codomain - 1.0)
    return uph * uabs / jnp.maximum(_pnorm(uabs, q), eps)


_TOL_MAX_ITERS = 200  # reference cap when iterating to tolerance (lipschitz.py:238)


def _power_iterate(u0, v0, fwd, bwd, n, atol, rtol, nu=None, nv=None):
    """Shared power-iteration driver: fixed ``n`` steps, or — when ``n`` is
    None — iterate to the (atol, rtol) tolerance with a ``lax.while_loop``
    capped at 200 steps (reference compute_weight, lipschitz.py:223-258).
    ``nu``/``nv`` override the u/v normalizers for non-2 induced norms."""
    nu = _normalize if nu is None else nu
    nv = _normalize if nv is None else nv

    def step(u, v):
        u = nu(fwd(v))
        v = nv(bwd(u))
        return u, v

    if n is not None:
        return jax.lax.fori_loop(0, n, lambda _, uv: step(*uv), (u0, v0))

    if atol is None or rtol is None:
        raise ValueError("Need one of n_iterations or (atol, rtol).")

    def cond(state):
        i, _, _, done = state
        return (i < _TOL_MAX_ITERS) & ~done

    def body(state):
        i, u, v, _ = state
        new_u, new_v = step(u, v)
        err_u = jnp.linalg.norm(new_u - u) / np.sqrt(u.size)
        err_v = jnp.linalg.norm(new_v - v) / np.sqrt(v.size)
        done = (err_u < atol + rtol * jnp.max(new_u)) & (
            err_v < atol + rtol * jnp.max(new_v))
        return i + 1, new_u, new_v, done

    _, u, v, _ = jax.lax.while_loop(
        cond, body, (0, u0, v0, jnp.asarray(False)))
    return u, v


class InducedNormLinear(Module):
    """Spectral-norm-constrained linear layer (lipschitz.py:132-292), p=2."""

    weight: jnp.ndarray  # (out, in) to match torch layout
    bias: Optional[jnp.ndarray]
    u: jnp.ndarray = buffer_field()
    v: jnp.ndarray = buffer_field()
    scale: jnp.ndarray = buffer_field()
    coeff: float = static_field(default=0.97)
    n_iterations: Optional[int] = static_field(default=5)
    atol: Optional[float] = static_field(default=None)
    rtol: Optional[float] = static_field(default=None)
    domain: float = static_field(default=2.0)
    codomain: float = static_field(default=2.0)

    @classmethod
    def create(cls, key, in_features, out_features, bias=True, coeff=0.97,
               n_iterations=5, zero_init=False, domain=2, codomain=2,
               atol=None, rtol=None):
        _check_p2(domain, codomain)
        kw, ku, kv = jax.random.split(key, 3)
        if zero_init:
            w = 1e-5 * jax.random.normal(kw, (out_features, in_features))
        else:
            # Kaiming-style init as in the reference's reset_parameters
            w = jax.random.normal(kw, (out_features, in_features)) * np.sqrt(
                1.0 / in_features
            )
        b = jnp.zeros(out_features) if bias else None
        u = _normalize(jax.random.normal(ku, (out_features,)))
        v = _normalize(jax.random.normal(kv, (in_features,)))
        self_ = cls(
            weight=w, bias=b, u=u, v=v, scale=jnp.zeros(()), coeff=coeff,
            n_iterations=n_iterations, atol=atol, rtol=rtol,
            domain=float(domain), codomain=float(codomain),
        )
        return self_.update_power_iteration(n_iterations=50)

    def update_power_iteration(self, n_iterations=None) -> "InducedNormLinear":
        """Run power iteration; returns updated module (lipschitz.py:223-270).

        With ``n_iterations`` (explicit or from construction) runs that many
        steps; when both are None, iterates to the layer's (atol, rtol)
        tolerance, capped at 200 steps like the reference."""
        n = self.n_iterations if n_iterations is None else n_iterations
        w = jax.lax.stop_gradient(self.weight)
        u, v = _power_iterate(
            self.u, self.v, lambda v: w @ v, lambda u: w.T @ u, n,
            self.atol, self.rtol,
            nu=lambda x: _normalize_u(x, self.codomain),
            nv=lambda x: _normalize_v(x, self.domain),
        )
        sigma = u @ (w @ v)
        return self.replace(u=u, v=v, scale=sigma)

    def _scaled_weight(self):
        sigma = self.u @ (self.weight @ self.v)
        factor = jnp.maximum(1.0, sigma / self.coeff)
        return self.weight / factor

    def __call__(self, x):
        y = x @ self._scaled_weight().T
        if self.bias is not None:
            y = y + self.bias
        return y


class InducedNormConv2d(Module):
    """Induced-norm-constrained conv layer (lipschitz.py:295-639).

    Power iteration maps u (output feature map) and v (input feature map)
    through conv / conv-transpose (reference _compute_weight_kxk,
    lipschitz.py:533-610); requires static spatial dims.  Any fixed induced
    (domain, codomain) norm order is supported via the same dual-norm
    maximizer steps as :class:`InducedNormLinear` (reference normalize_u/v,
    lipschitz.py:659-689) — for a 1x1 kernel with same-W-per-pixel the
    full-map iteration is mathematically equivalent to the reference's
    channels-only shortcut (block-diagonal operator: the induced p-norm of
    diag(W, ..., W) equals the induced p-norm of W).  Only the LEARNABLE-ord
    mode stays out of scope, as for the linear layer (see PARITY.md).
    """

    weight: jnp.ndarray  # (out, in, kh, kw)
    bias: Optional[jnp.ndarray]
    u: jnp.ndarray = buffer_field()  # flattened output map
    v: jnp.ndarray = buffer_field()  # flattened input map
    scale: jnp.ndarray = buffer_field()
    in_shape: tuple = static_field()  # (c_in, h, w)
    out_shape: tuple = static_field()
    padding: int = static_field(default=1)
    coeff: float = static_field(default=0.97)
    n_iterations: Optional[int] = static_field(default=5)
    atol: Optional[float] = static_field(default=None)
    rtol: Optional[float] = static_field(default=None)
    domain: float = static_field(default=2.0)
    codomain: float = static_field(default=2.0)

    @classmethod
    def create(cls, key, in_channels, out_channels, kernel_size, spatial_dims,
               bias=True, coeff=0.97, n_iterations=5, zero_init=False,
               stride=1, padding=None, domain=2, codomain=2,
               atol=None, rtol=None):
        _check_p2(domain, codomain)
        if stride != 1:
            raise NotImplementedError(
                "stride != 1 is not supported; the reference's LipschitzCNN"
                " (the only consumer, lipschitz.py:107-121) always uses"
                " stride=1."
            )
        if padding is not None and padding != kernel_size // 2:
            raise NotImplementedError(
                "only 'same' padding (kernel_size // 2) is supported, matching"
                " the reference's LipschitzCNN construction."
            )
        kw, ku, kv = jax.random.split(key, 3)
        k = kernel_size
        h, w_ = spatial_dims
        fan_in = in_channels * k * k
        if zero_init:
            w = 1e-5 * jax.random.normal(kw, (out_channels, in_channels, k, k))
        else:
            w = jax.random.normal(kw, (out_channels, in_channels, k, k)) * np.sqrt(
                1.0 / fan_in
            )
        b = jnp.zeros(out_channels) if bias else None
        u = _normalize_u(jax.random.normal(ku, (out_channels * h * w_,)),
                         float(codomain))
        v = _normalize_v(jax.random.normal(kv, (in_channels * h * w_,)),
                         float(domain))
        self_ = cls(
            weight=w, bias=b, u=u, v=v, scale=jnp.zeros(()),
            in_shape=(in_channels, h, w_), out_shape=(out_channels, h, w_),
            padding=k // 2, coeff=coeff, n_iterations=n_iterations,
            atol=atol, rtol=rtol,
            domain=float(domain), codomain=float(codomain),
        )
        return self_.update_power_iteration(n_iterations=50)

    def _conv(self, v_map, w):
        return jax.lax.conv_general_dilated(
            v_map[None], w, (1, 1), [(self.padding, self.padding)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0]

    def _conv_t(self, u_map, w):
        # gradient of conv wrt input == conv_transpose with same kernel
        _, vjp = jax.vjp(lambda v: self._conv(v, w), jnp.zeros(self.in_shape))
        return vjp(u_map)[0]

    def update_power_iteration(self, n_iterations=None) -> "InducedNormConv2d":
        n = self.n_iterations if n_iterations is None else n_iterations
        w = jax.lax.stop_gradient(self.weight)
        u, v = _power_iterate(
            self.u, self.v,
            lambda v: self._conv(v.reshape(self.in_shape), w).reshape(-1),
            lambda u: self._conv_t(u.reshape(self.out_shape), w).reshape(-1),
            n, self.atol, self.rtol,
            nu=lambda x: _normalize_u(x, self.codomain),
            nv=lambda x: _normalize_v(x, self.domain),
        )
        sigma = u @ self._conv(v.reshape(self.in_shape), w).reshape(-1)
        return self.replace(u=u, v=v, scale=sigma)

    def _scaled_weight(self):
        sigma = self.u @ self._conv(
            self.v.reshape(self.in_shape), self.weight
        ).reshape(-1)
        factor = jnp.maximum(1.0, sigma / self.coeff)
        return self.weight / factor

    def __call__(self, x):
        w = self._scaled_weight()
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(self.padding, self.padding)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.bias is not None:
            y = y + self.bias[None, :, None, None]
        return y


class LipschitzMLP(Module):
    """Swish + InducedNormLinear stack with L < 1 (lipschitz.py:14-66)."""

    layers: tuple

    @classmethod
    def create(cls, key, channels, lipschitz_const=0.97, max_lipschitz_iter=5,
               lipschitz_tolerance=None, init_zeros=True):
        """``max_lipschitz_iter=None`` + ``lipschitz_tolerance`` switches the
        layers to tolerance-based power iteration (lipschitz.py:21-35)."""
        n_layers = len(channels) - 1
        keys = jax.random.split(key, n_layers)
        layers = []
        for i in range(n_layers):
            layers.append(Swish.create())
            layers.append(
                InducedNormLinear.create(
                    keys[i], channels[i], channels[i + 1], coeff=lipschitz_const,
                    n_iterations=max_lipschitz_iter,
                    atol=lipschitz_tolerance, rtol=lipschitz_tolerance,
                    zero_init=init_zeros and i == n_layers - 1,
                )
            )
        return cls(layers=tuple(layers))

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class LipschitzCNN(Module):
    """Swish + InducedNormConv2d stack with L < 1 (lipschitz.py:69-129)."""

    layers: tuple

    @classmethod
    def create(cls, key, channels, kernel_size, spatial_dims, lipschitz_const=0.97,
               max_lipschitz_iter=5, lipschitz_tolerance=None, init_zeros=True):
        """``max_lipschitz_iter=None`` + ``lipschitz_tolerance`` switches the
        layers to tolerance-based power iteration (lipschitz.py:76-90)."""
        n_layers = len(kernel_size)
        keys = jax.random.split(key, n_layers)
        layers = []
        for i in range(n_layers):
            layers.append(Swish.create())
            layers.append(
                InducedNormConv2d.create(
                    keys[i], channels[i], channels[i + 1], kernel_size[i],
                    spatial_dims, coeff=lipschitz_const,
                    n_iterations=max_lipschitz_iter,
                    atol=lipschitz_tolerance, rtol=lipschitz_tolerance,
                    zero_init=init_zeros and i == n_layers - 1,
                )
            )
        return cls(layers=tuple(layers))

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


def leaky_elu(x, a=0.3):
    return a * x + (1 - a) * jax.nn.elu(x)


def asym_squash(x):
    return jnp.tanh(-leaky_elu(-x + 0.5493061829986572)) * 2 + 3
