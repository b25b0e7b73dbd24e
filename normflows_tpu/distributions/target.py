"""Target distributions (reference: normflows/distributions/target.py).

The reference's rejection sampler grows a list in a Python ``while`` loop
(target.py:69-73) — dynamic shapes.  Here it is a fixed-size-buffer
``lax.while_loop``: each round proposes ``num_samples`` candidates, scatters
accepted ones into the output buffer at positions computed with a cumulative
sum, and stops when the buffer is full.  Shapes stay static; the loop is
TPU-compilable.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module, static_field
from .base import LOG2PI


class Target(Module):
    """Target-distribution contract + generic rejection sampler (target.py:8-73).

    Subclasses define ``log_prob`` plus static ``n_dims`` / ``max_log_prob``.
    """

    prop_scale: float = static_field(default=6.0)
    prop_shift: float = static_field(default=-3.0)

    n_dims = None  # override
    max_log_prob = None  # override

    def log_prob(self, z, context=None):
        raise NotImplementedError("The log probability is not implemented yet.")

    def sample(self, key, num_samples: int = 1, context=None):
        """Rejection sampling with a static-shape while_loop (target.py:34-73)."""
        n_dims = self.n_dims

        def propose_round(key):
            k1, k2, k3 = jax.random.split(key, 3)
            eps = jax.random.uniform(k1, (num_samples, n_dims))
            z_ = self.prop_scale * eps + self.prop_shift
            u = jax.random.uniform(k2, (num_samples,))
            accept = jnp.exp(self.log_prob(z_) - self.max_log_prob) > u
            return z_, accept, k3

        def cond(carry):
            _, _, count = carry
            return count < num_samples

        def body(carry):
            key, buf, count = carry
            z_, accept, key = propose_round(key)
            # target slot for each accepted candidate
            pos = count + jnp.cumsum(accept.astype(jnp.int32)) - 1
            pos = jnp.where(accept & (pos < num_samples), pos, num_samples)  # drop
            buf = buf.at[pos].set(z_, mode="drop")
            count = jnp.minimum(num_samples, count + jnp.sum(accept))
            return key, buf, count

        buf = jnp.zeros((num_samples, n_dims))
        key, buf, _ = jax.lax.while_loop(
            cond, body, (key, buf, jnp.zeros((), jnp.int32))
        )
        return buf


class TwoIndependent(Target):
    """Product of two equal-size targets via channel Split (target.py:76-96)."""

    target1: Module
    target2: Module

    @property
    def n_dims(self):
        return self.target1.n_dims + self.target2.n_dims

    def log_prob(self, z, context=None):
        z1, z2 = jnp.split(z, 2, axis=1)
        return self.target1.log_prob(z1) + self.target2.log_prob(z2)

    def sample(self, key, num_samples: int = 1, context=None):
        k1, k2 = jax.random.split(key)
        z1 = self.target1.sample(k1, num_samples)
        z2 = self.target2.sample(k2, num_samples)
        return jnp.concatenate([z1, z2], axis=1)


class TwoMoons(Target):
    """2-D bimodal benchmark density (target.py:99-129)."""

    n_dims = 2
    max_log_prob = 0.0

    def log_prob(self, z, context=None):
        a = jnp.abs(z[:, 0])
        norm = jnp.linalg.norm(z, axis=1)
        return (
            -0.5 * ((norm - 2.0) / 0.2) ** 2
            - 0.5 * ((a - 2.0) / 0.3) ** 2
            + jnp.log1p(jnp.exp(-4.0 * a / 0.09))
        )


class CircularGaussianMixture(Module):
    """K Gaussians arranged on a circle of radius 2 (target.py:132-173)."""

    n_modes: int = static_field(default=8)

    @property
    def scale(self):
        return 2.0 / 3.0 * math.sin(math.pi / self.n_modes)

    def log_prob(self, z, context=None):
        angles = 2.0 * math.pi / self.n_modes * jnp.arange(self.n_modes)
        locs = jnp.stack([2.0 * jnp.sin(angles), 2.0 * jnp.cos(angles)], axis=1)
        d = jnp.sum((z[:, None, :] - locs[None]) ** 2, axis=-1) / (2.0 * self.scale**2)
        return -jnp.log(2.0 * math.pi * self.scale**2 * self.n_modes) + (
            jax.scipy.special.logsumexp(-d, axis=1)
        )

    def sample(self, key, num_samples: int = 1, context=None):
        ke, kp = jax.random.split(key)
        eps = jax.random.normal(ke, (num_samples, 2))
        phi = (
            2.0 * math.pi / self.n_modes
            * jax.random.randint(kp, (num_samples,), 0, self.n_modes)
        )
        loc = jnp.stack([2.0 * jnp.sin(phi), 2.0 * jnp.cos(phi)], axis=1)
        return eps * self.scale + loc


class RingMixture(Target):
    """Concentric rings in 2-D (target.py:176-195)."""

    n_rings: int = static_field(default=2)

    n_dims = 2
    max_log_prob = 0.0

    @property
    def scale(self):
        return 1.0 / 4.0 / self.n_rings

    def log_prob(self, z, context=None):
        norm = jnp.linalg.norm(z, axis=1)
        radii = 2.0 / self.n_rings * (jnp.arange(self.n_rings) + 1.0)
        d = ((norm[:, None] - radii[None]) ** 2) / (2.0 * self.scale**2)
        return jax.scipy.special.logsumexp(-d, axis=1)


class ConditionalDiagGaussian(Target):
    """Gaussian conditioned on context = concat(mean, std) (target.py:198-224)."""

    def log_prob(self, z, context=None):
        d = z.shape[-1]
        loc = context[:, :d]
        scale = context[:, d:]
        return -0.5 * d * LOG2PI - jnp.sum(
            jnp.log(scale) + 0.5 * ((z - loc) / scale) ** 2, axis=-1
        )

    def sample(self, key, num_samples: int = 1, context=None):
        d = context.shape[-1] // 2
        loc = context[:, :d]
        scale = context[:, d:]
        eps = jax.random.normal(key, (num_samples, d))
        return loc + scale * eps


class GaussianVonMises(Target):
    """Cylinder target of the NSF paper example.

    p(x, phi) = N(x; 0, 1) * VonMises(phi; mu=3x, kappa=1)
    (examples/paper_example_nsf.ipynb, 'Set up target' cell).  This is the
    headline reverse-KL benchmark (BASELINE.md row 2), so it ships in the
    library rather than only in an example.
    """

    prop_scale: float = static_field(default=2.0 * math.pi)
    prop_shift: float = static_field(default=-math.pi)

    n_dims = 2
    max_log_prob = -1.99

    @property
    def log_const(self):
        return -1.5 * math.log(2.0 * math.pi) - math.log(float(np.i0(1.0)))

    def log_prob(self, x, context=None):
        return -0.5 * x[:, 0] ** 2 + jnp.cos(x[:, 1] - 3.0 * x[:, 0]) + self.log_const
