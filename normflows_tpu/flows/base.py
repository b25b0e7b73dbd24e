"""Alias module for reference-path parity (normflows.flows.base)."""

from ..core.flow import (  # noqa: F401
    Flow,
    Reverse,
    Composite,
    zero_log_det_like_z,
    sum_except_batch,
)
