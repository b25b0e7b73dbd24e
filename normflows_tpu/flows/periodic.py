"""Periodic coordinate flows (reference: normflows/flows/periodic.py:6-73)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.module import buffer_field
from ..core.flow import Flow, zero_log_det_like_z


def _set_ind(z, ind, values):
    return z.at[..., ind].set(values)


class PeriodicWrap(Flow):
    """Wrap periodic coordinates into [-bound, bound] on inverse (periodic.py:6-32)."""

    ind: jnp.ndarray = buffer_field()
    bound: jnp.ndarray = buffer_field()

    @classmethod
    def create(cls, ind, bound=1.0):
        return cls(ind=jnp.asarray(ind), bound=jnp.asarray(bound, jnp.float32))

    def forward(self, z, context=None, *, key=None):
        return z, zero_log_det_like_z(z)

    def inverse(self, z, context=None, *, key=None):
        vals = jnp.mod(z[..., self.ind] + self.bound, 2.0 * self.bound) - self.bound
        return _set_ind(z, self.ind, vals), zero_log_det_like_z(z)


class PeriodicShift(Flow):
    """Shift-and-wrap periodic coordinates (periodic.py:35-73)."""

    ind: jnp.ndarray = buffer_field()
    bound: jnp.ndarray = buffer_field()
    shift: jnp.ndarray = buffer_field()

    @classmethod
    def create(cls, ind, bound=1.0, shift=0.0):
        return cls(
            ind=jnp.asarray(ind),
            bound=jnp.asarray(bound, jnp.float32),
            shift=jnp.asarray(shift, jnp.float32),
        )

    def forward(self, z, context=None, *, key=None):
        vals = (
            jnp.mod(z[..., self.ind] + self.shift + self.bound, 2.0 * self.bound)
            - self.bound
        )
        return _set_ind(z, self.ind, vals), zero_log_det_like_z(z)

    def inverse(self, z, context=None, *, key=None):
        vals = (
            jnp.mod(z[..., self.ind] - self.shift + self.bound, 2.0 * self.bound)
            - self.bound
        )
        return _set_ind(z, self.ind, vals), zero_log_det_like_z(z)
