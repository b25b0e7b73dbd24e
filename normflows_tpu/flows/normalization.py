"""ActNorm and BatchNorm flows (reference: normflows/flows/normalization.py).

The reference's ActNorm mutates its parameters on the first batch inside
``forward``/``inverse`` (normalization.py:19-39) — impossible under ``jit``.
Here initialization is an explicit functional pass: ``data_dep_init``
(density/inverse direction) or ``data_dep_init_forward`` return a *new* module
with whitening ``s, t`` and the init flag set; facades expose
``NormalizingFlow.init_actnorm`` to run it over a model (see core/facades.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.module import buffer_field, static_field
from ..core.flow import Flow
from .affine.coupling import AffineConstFlow


class ActNorm(AffineConstFlow):
    """AffineConstFlow with data-dependent init (normalization.py:7-39)."""

    initialized: jnp.ndarray = buffer_field(default=None)

    @classmethod
    def create(cls, shape):
        if isinstance(shape, int):
            shape = (shape,)
        return cls(
            s=jnp.zeros((1, *shape)),
            t=jnp.zeros((1, *shape)),
            initialized=jnp.zeros((), jnp.bool_),
        )

    def _batch_dims(self, z):
        """Axes over which s broadcasts (batch + spatial), cf. coupling.py:27-31."""
        dims = [0]
        for i, (zi, si) in enumerate(zip(z.shape[1:], self.s.shape[1:])):
            if si == 1:
                dims.append(i + 1)
        return tuple(dims)

    def data_dep_init(self, z, context=None):
        """Whiten using an inverse-direction (data) batch: normalization.py:31-39."""
        dims = self._batch_dims(z)
        std = jnp.std(z, axis=dims, keepdims=True, ddof=1)
        s = jnp.log(std + 1e-6)
        t = jnp.mean(z, axis=dims, keepdims=True)
        new = self.replace(s=s, t=t, initialized=jnp.ones((), jnp.bool_))
        z_out, _ = new.inverse(z, context)
        return new, z_out

    def data_dep_init_forward(self, z, context=None):
        """Whiten using a forward-direction batch: normalization.py:19-29."""
        dims = self._batch_dims(z)
        std = jnp.std(z, axis=dims, keepdims=True, ddof=1)
        s = -jnp.log(std + 1e-6)
        t = -jnp.mean(z, axis=dims, keepdims=True) * jnp.exp(s)
        new = self.replace(s=s, t=t, initialized=jnp.ones((), jnp.bool_))
        z_out, _ = new.forward(z, context)
        return new, z_out


class BatchNorm(Flow):
    """Batch-stat whitening flow, forward only (normalization.py:42-62).

    Statistics are computed from the batch with gradients stopped, matching the
    reference's 'without considering the derivatives of the batch statistics'.
    """

    eps: float = static_field(default=1e-10)

    def forward(self, z, context=None, *, key=None):
        import jax

        mean = jax.lax.stop_gradient(jnp.mean(z, axis=0, keepdims=True))
        std = jax.lax.stop_gradient(jnp.std(z, axis=0, keepdims=True, ddof=1))
        var_eps = std**2 + self.eps
        z_ = (z - mean) / jnp.sqrt(var_eps)
        log_det = jnp.full(z.shape[0], -0.5 * jnp.sum(jnp.log(var_eps)))
        return z_, log_det
