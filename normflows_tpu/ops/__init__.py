"""Numerical kernels: jnp reference implementations + Pallas TPU kernels."""

from . import splines, backend
from .backend import (
    set_kernel_backend,
    get_kernel_backend,
    use_pallas,
    set_made_fusion,
    made_fusion_enabled,
)
