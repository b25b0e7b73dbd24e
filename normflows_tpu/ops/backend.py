"""Kernel backend selection.

"auto" (default) uses the fused Pallas kernels on TPU backends and the
XLA-fused jnp reference elsewhere; "pallas"/"xla" force a choice
(``interpret=True`` keeps Pallas usable on CPU for debugging).
"""

from __future__ import annotations

import jax

_BACKEND = "auto"


def set_kernel_backend(mode: str):
    """mode: 'auto' | 'pallas' | 'xla'."""
    global _BACKEND
    if mode not in ("auto", "pallas", "xla"):
        raise ValueError(mode)
    _BACKEND = mode


def get_kernel_backend() -> str:
    return _BACKEND


def use_pallas() -> bool:
    if _BACKEND == "pallas":
        return True
    if _BACKEND == "xla":
        return False
    try:
        platform = jax.default_backend()
    except RuntimeError:
        return False
    return platform in ("tpu", "axon")
