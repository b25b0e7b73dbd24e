"""Numerical kernels: jnp reference implementations + Pallas TPU kernels."""

from . import splines
