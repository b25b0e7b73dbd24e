"""API-parity alias: the spline kernels live in ops/splines.py (the
reference exposes them as normflows.utils.splines)."""

from ..ops.splines import (  # noqa: F401
    DEFAULT_MIN_BIN_WIDTH,
    DEFAULT_MIN_BIN_HEIGHT,
    DEFAULT_MIN_DERIVATIVE,
    TAIL_NONE,
    TAIL_LINEAR,
    TAIL_CIRCULAR,
    searchsorted,
    rational_quadratic_spline,
    unconstrained_rational_quadratic_spline,
    make_knot_derivatives,
)
