"""Base distributions (reference: normflows/distributions/base.py).

Pure-functional re-design: sampling takes an explicit PRNG ``key``
(replacing torch's global RNG at base.py:81 etc.); temperature is a static
field updated functionally (``dist.replace(temperature=0.7)``), mirroring
``set_temperature`` (core.py:634-653).  Contract:

    sample_and_log_prob(key, num_samples, context=None) -> (z, log_p)
    log_prob(z, context=None) -> (batch,)
    sample(key, num_samples, context=None) -> z
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module, static_field, buffer_field

LOG2PI = math.log(2.0 * math.pi)


def _tuple_shape(shape):
    if isinstance(shape, int):
        return (shape,)
    return tuple(shape)


def one_hot(y, num_classes: int, dtype=jnp.float32):
    """Accept int labels (batch,) or pre-one-hot (batch, C)."""
    y = jnp.asarray(y)
    if y.ndim == 1 and jnp.issubdtype(y.dtype, jnp.integer):
        return jax.nn.one_hot(y, num_classes, dtype=dtype)
    return y.astype(dtype)


class BaseDistribution(Module):
    """ABC (base.py:8-49)."""

    def sample_and_log_prob(self, key, num_samples: int = 1, context=None):
        raise NotImplementedError

    def log_prob(self, z, context=None):
        raise NotImplementedError

    def sample(self, key, num_samples: int = 1, context=None):
        z, _ = self.sample_and_log_prob(key, num_samples, context)
        return z

    # reference's forward(num_samples) == sample_and_log_prob
    def __call__(self, key, num_samples: int = 1, context=None):
        return self.sample_and_log_prob(key, num_samples, context)


class DiagGaussian(BaseDistribution):
    """Diagonal Gaussian with trainable loc/log_scale (base.py:52-103)."""

    loc: jnp.ndarray
    log_scale: jnp.ndarray
    shape: tuple = static_field()
    temperature: Optional[float] = static_field(default=None)
    trainable: bool = static_field(default=True)

    @classmethod
    def create(cls, shape, trainable: bool = True):
        shape = _tuple_shape(shape)
        # `trainable=False` makes loc/log_scale buffer leaves (excluded from
        # `partition`'s differentiable part) — matching the reference
        # registering them as fixed buffers (base.py:62-72).
        return cls(
            loc=jnp.zeros((1, *shape)),
            log_scale=jnp.zeros((1, *shape)),
            shape=shape,
            trainable=trainable,
        )

    @property
    def d(self):
        return int(np.prod(self.shape))

    def _log_scale(self):
        if self.temperature is None:
            return self.log_scale
        return self.log_scale + math.log(self.temperature)

    def sample_and_log_prob(self, key, num_samples: int = 1, context=None):
        log_scale = self._log_scale()
        eps = jax.random.normal(key, (num_samples, *self.shape), self.loc.dtype)
        z = self.loc + jnp.exp(log_scale) * eps
        axes = tuple(range(1, len(self.shape) + 1))
        log_p = -0.5 * self.d * LOG2PI - jnp.sum(
            log_scale + 0.5 * eps**2, axis=axes
        )
        return z, log_p

    def log_prob(self, z, context=None):
        log_scale = self._log_scale()
        axes = tuple(range(1, len(self.shape) + 1))
        return -0.5 * self.d * LOG2PI - jnp.sum(
            log_scale + 0.5 * ((z - self.loc) / jnp.exp(log_scale)) ** 2, axis=axes
        )


class ConditionalDiagGaussian(BaseDistribution):
    """Diagonal Gaussian parameterized by a context encoder (base.py:106-155)."""

    context_encoder: Module
    shape: tuple = static_field()

    @classmethod
    def create(cls, shape, context_encoder):
        return cls(context_encoder=context_encoder, shape=_tuple_shape(shape))

    @property
    def d(self):
        return int(np.prod(self.shape))

    def _params(self, context):
        out = self.context_encoder(context)
        split = out.shape[-1] // 2
        return out[..., :split], out[..., split:]

    def sample_and_log_prob(self, key, num_samples: int = 1, context=None):
        mean, log_scale = self._params(context)
        eps = jax.random.normal(key, (num_samples, *self.shape), mean.dtype)
        z = mean + jnp.exp(log_scale) * eps
        axes = tuple(range(1, len(self.shape) + 1))
        log_p = -0.5 * self.d * LOG2PI - jnp.sum(
            log_scale + 0.5 * eps**2, axis=axes
        )
        return z, log_p

    def log_prob(self, z, context=None):
        mean, log_scale = self._params(context)
        axes = tuple(range(1, len(self.shape) + 1))
        return -0.5 * self.d * LOG2PI - jnp.sum(
            log_scale + 0.5 * ((z - mean) / jnp.exp(log_scale)) ** 2, axis=axes
        )


class Uniform(BaseDistribution):
    """Box uniform, -inf log-prob outside support (base.py:158-195)."""

    shape: tuple = static_field()
    low: float = static_field(default=-1.0)
    high: float = static_field(default=1.0)

    @classmethod
    def create(cls, shape, low=-1.0, high=1.0):
        return cls(shape=_tuple_shape(shape), low=float(low), high=float(high))

    @property
    def d(self):
        return int(np.prod(self.shape))

    @property
    def log_prob_val(self):
        return -self.d * math.log(self.high - self.low)

    def sample_and_log_prob(self, key, num_samples: int = 1, context=None):
        z = jax.random.uniform(
            key, (num_samples, *self.shape), minval=self.low, maxval=self.high
        )
        return z, jnp.full(num_samples, self.log_prob_val)

    def log_prob(self, z, context=None):
        out = (z < self.low) | (z > self.high)
        any_out = jnp.any(out.reshape(z.shape[0], -1), axis=-1)
        return jnp.where(any_out, -jnp.inf, self.log_prob_val)


class UniformGaussian(BaseDistribution):
    """Per-index mix of uniform and Gaussian dims (base.py:198-270).

    ``ind`` are the uniformly-distributed dims (width scale[i], centered at 0);
    the rest are Gaussian with std scale[i].  Used as the circular-NSF base.
    """

    ind: jnp.ndarray = buffer_field()
    ind_: jnp.ndarray = buffer_field()
    inv_perm: jnp.ndarray = buffer_field()
    scale: jnp.ndarray = buffer_field()
    ndim: int = static_field()

    @classmethod
    def create(cls, ndim: int, ind, scale=None):
        if isinstance(ind, int):
            ind = [ind]
        ind = np.asarray(ind, np.int32).reshape(-1)
        rest = np.asarray([i for i in range(ndim) if i not in set(ind.tolist())], np.int32)
        perm = np.concatenate([ind, rest])
        inv_perm = np.zeros(ndim, np.int32)
        inv_perm[perm] = np.arange(ndim)
        scale_arr = jnp.ones(ndim) if scale is None else jnp.asarray(scale, jnp.float32)
        return cls(
            ind=jnp.asarray(ind),
            ind_=jnp.asarray(rest),
            inv_perm=jnp.asarray(inv_perm),
            scale=scale_arr,
            ndim=ndim,
        )

    def sample_and_log_prob(self, key, num_samples: int = 1, context=None):
        z = self.sample(key, num_samples, context)
        return z, self.log_prob(z, context)

    def sample(self, key, num_samples: int = 1, context=None):
        ku, kg = jax.random.split(key)
        eps_u = jax.random.uniform(ku, (num_samples, self.ind.shape[0])) - 0.5
        eps_g = jax.random.normal(kg, (num_samples, self.ind_.shape[0]))
        z = jnp.concatenate([eps_u, eps_g], axis=-1)[..., self.inv_perm]
        return self.scale * z

    def log_prob(self, z, context=None):
        log_p_u = -jnp.sum(jnp.log(self.scale[self.ind]))
        zg = z[..., self.ind_] / self.scale[self.ind_]
        log_p_g = jnp.sum(
            -0.5 * LOG2PI - jnp.log(self.scale[self.ind_]) - 0.5 * zg**2, axis=-1
        )
        return log_p_u + log_p_g


class ClassCondDiagGaussian(BaseDistribution):
    """Per-class diagonal Gaussian (base.py:273-344)."""

    loc: jnp.ndarray  # (*shape, num_classes)
    log_scale: jnp.ndarray
    shape: tuple = static_field()
    num_classes: int = static_field()
    temperature: Optional[float] = static_field(default=None)

    @classmethod
    def create(cls, shape, num_classes: int):
        shape = _tuple_shape(shape)
        return cls(
            loc=jnp.zeros((*shape, num_classes)),
            log_scale=jnp.zeros((*shape, num_classes)),
            shape=shape,
            num_classes=num_classes,
        )

    @property
    def d(self):
        return int(np.prod(self.shape))

    def _params(self, y_onehot):
        # (*shape, C) @ (C, B) -> (*shape, B) -> (B, *shape)
        n_dim = len(self.shape)
        perm = (n_dim,) + tuple(range(n_dim))
        loc = jnp.transpose(self.loc @ y_onehot.T, perm)
        log_scale = jnp.transpose(self.log_scale @ y_onehot.T, perm)
        if self.temperature is not None:
            log_scale = log_scale + math.log(self.temperature)
        return loc, log_scale

    def sample_and_log_prob(self, key, num_samples: int = 1, context=None):
        y = context
        if y is None:
            key, ky = jax.random.split(key)
            y = jax.random.randint(ky, (num_samples,), 0, self.num_classes)
        else:
            num_samples = y.shape[0]
        y_onehot = one_hot(y, self.num_classes, self.loc.dtype)
        loc, log_scale = self._params(y_onehot)
        eps = jax.random.normal(key, (num_samples, *self.shape), self.loc.dtype)
        z = loc + jnp.exp(log_scale) * eps
        axes = tuple(range(1, len(self.shape) + 1))
        log_p = -0.5 * self.d * LOG2PI - jnp.sum(
            log_scale + 0.5 * eps**2, axis=axes
        )
        return z, log_p

    def log_prob(self, z, context=None):
        y_onehot = one_hot(context, self.num_classes, self.loc.dtype)
        loc, log_scale = self._params(y_onehot)
        axes = tuple(range(1, len(self.shape) + 1))
        return -0.5 * self.d * LOG2PI - jnp.sum(
            log_scale + 0.5 * ((z - loc) / jnp.exp(log_scale)) ** 2, axis=axes
        )


class GlowBase(BaseDistribution):
    """Per-channel Gaussian with logscale_factor reparam (base.py:347-471)."""

    loc: jnp.ndarray
    loc_logs: jnp.ndarray
    log_scale: jnp.ndarray
    log_scale_logs: jnp.ndarray
    loc_cc: Optional[jnp.ndarray]
    log_scale_cc: Optional[jnp.ndarray]
    shape: tuple = static_field()
    num_classes: Optional[int] = static_field(default=None)
    logscale_factor: float = static_field(default=3.0)
    temperature: Optional[float] = static_field(default=None)

    @classmethod
    def create(cls, shape, num_classes=None, logscale_factor: float = 3.0):
        shape = _tuple_shape(shape)
        n_dim = len(shape)
        pshape = (1, shape[0]) + (1,) * (n_dim - 1)
        cc = num_classes is not None
        return cls(
            loc=jnp.zeros(pshape),
            loc_logs=jnp.zeros(pshape),
            log_scale=jnp.zeros(pshape),
            log_scale_logs=jnp.zeros(pshape),
            loc_cc=jnp.zeros((num_classes, shape[0])) if cc else None,
            log_scale_cc=jnp.zeros((num_classes, shape[0])) if cc else None,
            shape=shape,
            num_classes=num_classes,
            logscale_factor=logscale_factor,
        )

    @property
    def d(self):
        return int(np.prod(self.shape))

    @property
    def num_pix(self):
        return int(np.prod(self.shape[1:]))

    def _params(self, y):
        loc = self.loc * jnp.exp(self.loc_logs * self.logscale_factor)
        log_scale = self.log_scale * jnp.exp(self.log_scale_logs * self.logscale_factor)
        if self.num_classes is not None and y is not None:
            y_onehot = one_hot(y, self.num_classes, self.loc.dtype)
            n_dim = len(self.shape)
            cshape = (-1, self.shape[0]) + (1,) * (n_dim - 1)
            loc = loc + (y_onehot @ self.loc_cc).reshape(cshape)
            log_scale = log_scale + (y_onehot @ self.log_scale_cc).reshape(cshape)
        if self.temperature is not None:
            log_scale = log_scale + math.log(self.temperature)
        return loc, log_scale

    def sample_and_log_prob(self, key, num_samples: int = 1, context=None):
        y = context
        if self.num_classes is not None:
            if y is None:
                key, ky = jax.random.split(key)
                y = jax.random.randint(ky, (num_samples,), 0, self.num_classes)
            else:
                num_samples = y.shape[0]
        loc, log_scale = self._params(y)
        eps = jax.random.normal(key, (num_samples, *self.shape), self.loc.dtype)
        z = loc + jnp.exp(log_scale) * eps
        axes = tuple(range(1, len(self.shape) + 1))
        log_p = (
            -0.5 * self.d * LOG2PI
            - self.num_pix * jnp.sum(log_scale, axis=axes)
            - 0.5 * jnp.sum(eps**2, axis=axes)
        )
        return z, log_p

    def log_prob(self, z, context=None):
        loc, log_scale = self._params(context)
        axes = tuple(range(1, len(self.shape) + 1))
        return (
            -0.5 * self.d * LOG2PI
            - self.num_pix * jnp.sum(log_scale, axis=axes)
            - 0.5 * jnp.sum(((z - loc) / jnp.exp(log_scale)) ** 2, axis=axes)
        )


class AffineGaussian(BaseDistribution):
    """N(0, I) pushed through an (CC)AffineConst flow (base.py:474-570)."""

    transform: Module
    shape: tuple = static_field()
    num_classes: Optional[int] = static_field(default=None)
    temperature: Optional[float] = static_field(default=None)

    @classmethod
    def create(cls, shape, affine_shape, num_classes=None):
        from ..flows.affine.coupling import AffineConstFlow, CCAffineConst

        shape = _tuple_shape(shape)
        if num_classes is not None:
            transform = CCAffineConst.create(affine_shape, num_classes)
        else:
            transform = AffineConstFlow.create(affine_shape)
        return cls(transform=transform, shape=shape, num_classes=num_classes)

    @property
    def d(self):
        return int(np.prod(self.shape))

    def sample_and_log_prob(self, key, num_samples: int = 1, context=None):
        y = context
        if self.num_classes is not None:
            if y is None:
                key, ky = jax.random.split(key)
                y = jax.random.randint(ky, (num_samples,), 0, self.num_classes)
            else:
                num_samples = y.shape[0]
            y = one_hot(y, self.num_classes)
        log_scale = math.log(self.temperature) if self.temperature is not None else 0.0
        eps = jax.random.normal(key, (num_samples, *self.shape))
        z = math.exp(log_scale) * eps
        axes = tuple(range(1, len(self.shape) + 1))
        log_p = (
            -0.5 * self.d * LOG2PI
            - self.d * log_scale
            - 0.5 * jnp.sum(eps**2, axis=axes)
        )
        if self.num_classes is not None:
            z, log_det = self.transform.forward(z, y)
        else:
            z, log_det = self.transform.forward(z)
        return z, log_p - log_det

    def log_prob(self, z, context=None):
        y = context
        if self.num_classes is not None:
            y = one_hot(y, self.num_classes)
            z, log_p = self.transform.inverse(z, y)
        else:
            z, log_p = self.transform.inverse(z)
        log_scale = math.log(self.temperature) if self.temperature is not None else 0.0
        z = z / math.exp(log_scale)
        axes = tuple(range(1, len(self.shape) + 1))
        return (
            log_p
            - self.d * log_scale
            - 0.5 * self.d * LOG2PI
            - 0.5 * jnp.sum(z**2, axis=axes)
        )


class GaussianMixture(BaseDistribution):
    """Trainable diagonal GMM (base.py:573-659)."""

    loc: jnp.ndarray  # (1, n_modes, dim)
    log_scale: jnp.ndarray
    weight_scores: jnp.ndarray  # (1, n_modes)
    n_modes: int = static_field()
    dim: int = static_field()
    trainable: bool = static_field(default=True)

    @classmethod
    def create(cls, n_modes, dim, loc=None, scale=None, weights=None,
               trainable=True, key=None):
        # `trainable=False` makes loc/log_scale/weight_scores buffer leaves
        # (excluded by `partition`), matching the reference registering them
        # as fixed buffers (base.py:593-608).
        if loc is None:
            if key is None:
                key = jax.random.key(0)
            loc = jax.random.normal(key, (n_modes, dim))
        loc = jnp.asarray(loc, jnp.float32)[None]
        scale = jnp.ones((n_modes, dim)) if scale is None else jnp.asarray(scale, jnp.float32)
        scale = scale[None] if scale.ndim == 2 else scale
        weights = jnp.ones(n_modes) if weights is None else jnp.asarray(weights, jnp.float32)
        weights = weights / jnp.sum(weights)
        return cls(
            loc=loc,
            log_scale=jnp.log(scale),
            weight_scores=jnp.log(weights)[None],
            n_modes=n_modes,
            dim=dim,
            trainable=trainable,
        )

    def sample_and_log_prob(self, key, num_samples: int = 1, context=None):
        km, ke = jax.random.split(key)
        weights = jax.nn.softmax(self.weight_scores, axis=1)
        mode = jax.random.categorical(km, jnp.log(weights[0]), shape=(num_samples,))
        mode_1h = jax.nn.one_hot(mode, self.n_modes)[..., None]
        eps_ = jax.random.normal(ke, (num_samples, self.dim), self.loc.dtype)
        scale_sample = jnp.sum(jnp.exp(self.log_scale) * mode_1h, axis=1)
        loc_sample = jnp.sum(self.loc * mode_1h, axis=1)
        z = eps_ * scale_sample + loc_sample
        return z, self.log_prob(z)

    def log_prob(self, z, context=None):
        weights = jax.nn.softmax(self.weight_scores, axis=1)
        eps = (z[:, None, :] - self.loc) / jnp.exp(self.log_scale)
        log_p = (
            -0.5 * self.dim * LOG2PI
            + jnp.log(weights)
            - 0.5 * jnp.sum(eps**2, axis=2)
            - jnp.sum(self.log_scale, axis=2)
        )
        return jax.scipy.special.logsumexp(log_p, axis=1)


class GaussianPCA(BaseDistribution):
    """Low-rank Gaussian z = W eps + loc (base.py:662-719).

    Note: the reference's normalizer uses ``det(Sig)`` where the Gaussian
    density requires ``logdet(Sig)`` (base.py:699-702) — we implement the
    mathematically correct ``slogdet`` form.
    """

    loc: jnp.ndarray
    W: jnp.ndarray  # (latent_dim, dim)
    log_sigma: jnp.ndarray
    dim: int = static_field()
    latent_dim: int = static_field()

    @classmethod
    def create(cls, dim, latent_dim=None, sigma: float = 0.1, key=None):
        if latent_dim is None:
            latent_dim = dim
        if key is None:
            key = jax.random.key(0)
        return cls(
            loc=jnp.zeros((1, dim)),
            W=jax.random.normal(key, (latent_dim, dim)),
            log_sigma=jnp.asarray(math.log(sigma)),
            dim=dim,
            latent_dim=latent_dim,
        )

    def _sig(self):
        return self.W.T @ self.W + jnp.exp(2.0 * self.log_sigma) * jnp.eye(self.dim)

    def _log_prob_centered(self, z_):
        Sig = self._sig()
        _, logdet = jnp.linalg.slogdet(Sig)
        sol = jnp.linalg.solve(Sig, z_.T).T
        return (
            -0.5 * self.dim * LOG2PI
            - 0.5 * logdet
            - 0.5 * jnp.sum(z_ * sol, axis=1)
        )

    def sample_and_log_prob(self, key, num_samples: int = 1, context=None):
        eps = jax.random.normal(key, (num_samples, self.latent_dim), self.loc.dtype)
        z_ = eps @ self.W
        z = z_ + self.loc
        return z, self._log_prob_centered(z_)

    def log_prob(self, z, context=None):
        return self._log_prob_centered(z - self.loc)
