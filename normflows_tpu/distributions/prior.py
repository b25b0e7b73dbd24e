"""2-D energy landscapes (reference: normflows/distributions/prior.py) —
the Rezende & Mohamed planar-flow test suite, plus ImagePrior."""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module, static_field, buffer_field


class PriorDistribution(Module):
    def log_prob(self, z):
        raise NotImplementedError


class ImagePrior(PriorDistribution):
    """Density from image intensities with rejection sampler (prior.py:21-104)."""

    image: jnp.ndarray = buffer_field()
    density: jnp.ndarray = buffer_field()
    scale: jnp.ndarray = buffer_field()
    shift: jnp.ndarray = buffer_field()

    @classmethod
    def create(cls, image, x_range=(-3, 3), y_range=(-3, 3), eps=1e-10):
        image_ = np.flip(np.asarray(image), 0).transpose() + eps
        image_ = image_ / np.max(image_)
        density = np.log(image_ / np.sum(image_))
        scale = np.array([[x_range[1] - x_range[0], y_range[1] - y_range[0]]])
        shift = np.array([[x_range[0], y_range[0]]])
        return cls(
            image=jnp.asarray(image_, jnp.float32),
            density=jnp.asarray(density, jnp.float32),
            scale=jnp.asarray(scale, jnp.float32),
            shift=jnp.asarray(shift, jnp.float32),
        )

    def log_prob(self, z):
        size = jnp.asarray(self.image.shape, jnp.float32)
        z_ = jnp.clip((z - self.shift) / self.scale, 0.0, 1.0)
        ind = (z_ * (size - 1)).astype(jnp.int32)
        return self.density[ind[:, 0], ind[:, 1]]

    def sample(self, key, num_samples: int = 1):
        """Static-shape rejection sampling (cf. target.py pattern)."""
        size = jnp.asarray(self.image.shape, jnp.float32)

        def cond(carry):
            _, _, count = carry
            return count < num_samples

        def body(carry):
            key, buf, count = carry
            key, k1, k2 = jax.random.split(key, 3)
            z_ = jax.random.uniform(k1, (num_samples, 2))
            prob = jax.random.uniform(k2, (num_samples,))
            ind = (z_ * (size - 1)).astype(jnp.int32)
            intensity = self.image[ind[:, 0], ind[:, 1]]
            accept = intensity > prob
            pos = count + jnp.cumsum(accept.astype(jnp.int32)) - 1
            pos = jnp.where(accept & (pos < num_samples), pos, num_samples)
            buf = buf.at[pos].set(z_ * self.scale + self.shift, mode="drop")
            count = jnp.minimum(num_samples, count + jnp.sum(accept))
            return key, buf, count

        buf = jnp.zeros((num_samples, 2))
        _, buf, _ = jax.lax.while_loop(
            cond, body, (key, buf, jnp.zeros((), jnp.int32))
        )
        return buf


class TwoModes(PriorDistribution):
    """Two modes at z[0] = +/- loc (prior.py:107-148)."""

    loc: float = static_field(default=2.0)
    scale: float = static_field(default=0.2)

    def log_prob(self, z):
        a = jnp.abs(z[:, 0])
        eps = abs(self.loc)
        return (
            -0.5 * ((jnp.linalg.norm(z, axis=1) - self.loc) / (2 * self.scale)) ** 2
            - 0.5 * ((a - eps) / (3 * self.scale)) ** 2
            + jnp.log1p(jnp.exp(-2 * (a * eps) / (3 * self.scale) ** 2))
        )


def _transpose_last_first(z):
    if z.ndim > 1:
        return jnp.moveaxis(z, -1, 0)
    return z


class Sinusoidal(PriorDistribution):
    """Sinusoidal ridge density (prior.py:151-191)."""

    scale: float = static_field(default=0.2)
    period: float = static_field(default=4.0)

    def log_prob(self, z):
        z_ = _transpose_last_first(z)
        w_1 = jnp.sin(2 * np.pi / self.period * z_[0])
        norm4 = jnp.sum(jnp.abs(z_) ** 4, axis=0) ** 0.25
        return (
            -0.5 * ((z_[1] - w_1) / self.scale) ** 2
            - 0.5 * (norm4 / (20 * self.scale)) ** 4
        )


class Sinusoidal_gap(PriorDistribution):
    """Sinusoidal with a gap (prior.py:194-240)."""

    scale: float = static_field(default=0.35)
    period: float = static_field(default=4.0)
    w2_scale: float = static_field(default=0.6)
    w2_amp: float = static_field(default=3.0)
    w2_mu: float = static_field(default=1.0)

    def log_prob(self, z):
        z_ = _transpose_last_first(z)
        w_1 = jnp.sin(2 * np.pi / self.period * z_[0])
        w_2 = self.w2_amp * jnp.exp(-0.5 * ((z_[0] - self.w2_mu) / self.w2_scale) ** 2)
        eps = jnp.abs(w_2 / 2)
        a = jnp.abs(z_[1] - w_1 + w_2 / 2)
        norm4 = jnp.sum(jnp.abs(z_) ** 4, axis=0) ** 0.25
        return (
            -0.5 * ((a - eps) / self.scale) ** 2
            + jnp.log1p(jnp.exp(-2 * (eps * a) / self.scale**2))
            - 0.5 * (norm4 / (20 * self.scale)) ** 4
        )


class Sinusoidal_split(PriorDistribution):
    """Sinusoidal with a split (prior.py:243-289)."""

    scale: float = static_field(default=0.4)
    period: float = static_field(default=4.0)
    w3_scale: float = static_field(default=0.3)
    w3_amp: float = static_field(default=3.0)
    w3_mu: float = static_field(default=1.0)

    def log_prob(self, z):
        z_ = _transpose_last_first(z)
        w_1 = jnp.sin(2 * np.pi / self.period * z_[0])
        w_3 = self.w3_amp * jax.nn.sigmoid((z_[0] - self.w3_mu) / self.w3_scale)
        eps = jnp.abs(w_3 / 2)
        a = jnp.abs(z_[1] - w_1 + w_3 / 2)
        norm4 = jnp.sum(jnp.abs(z_) ** 4, axis=0) ** 0.25
        return (
            -0.5 * ((a - eps) / self.scale) ** 2
            + jnp.log1p(jnp.exp(-2 * (eps * a) / self.scale**2))
            - 0.5 * (norm4 / (20 * self.scale)) ** 4
        )


class Smiley(PriorDistribution):
    """Smiley density :) (prior.py:292-327)."""

    scale: float = static_field(default=0.2)
    loc: float = static_field(default=2.0)

    def log_prob(self, z):
        z_ = _transpose_last_first(z)
        return (
            -0.5 * ((jnp.linalg.norm(z_, axis=0) - self.loc) / (2 * self.scale)) ** 2
            - 0.5 * ((jnp.abs(z_[1] + 0.8) - 1.2) / (2 * self.scale)) ** 2
        )
