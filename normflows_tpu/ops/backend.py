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


_INTERPRET = False


def set_pallas_interpret(enabled: bool):
    """Run Pallas kernels in interpret mode (CPU testing of TPU-only paths)."""
    global _INTERPRET
    _INTERPRET = bool(enabled)


def pallas_interpret() -> bool:
    return _INTERPRET


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


# Fused MADE MLP kernel (ops/made_pallas.py) is opt-in: measured on the
# flagship NSF-cylinder config the XLA path autodiffs the masked MLP faster
# than the hand-fused backward kernel in BOTH precisions (f32: 912k vs 834k;
# bf16: 966-987k vs 857-861k samples/s end-to-end) — the in-kernel vjp
# recompute costs 3x forward FLOPs vs XLA's 2x + stored residuals, and on
# this chip the MXU is the scarcer resource.  "auto" therefore keeps it off;
# it remains available for hardware with a different FLOP:bandwidth ratio.
_MADE_FUSION = False


def set_made_fusion(enabled: bool):
    global _MADE_FUSION
    _MADE_FUSION = bool(enabled)


def made_fusion_enabled() -> bool:
    return _MADE_FUSION and use_pallas()
