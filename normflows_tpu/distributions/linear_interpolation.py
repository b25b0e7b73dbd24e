"""Annealing bridge (reference: normflows/distributions/linear_interpolation.py)."""

from __future__ import annotations

from ..core.module import Module, static_field


class LinearInterpolation(Module):
    """log_p = alpha * log_p1 + (1 - alpha) * log_p2."""

    dist1: Module
    dist2: Module
    alpha: float = static_field(default=0.5)

    def log_prob(self, z, context=None):
        return self.alpha * self.dist1.log_prob(z) + (
            1.0 - self.alpha
        ) * self.dist2.log_prob(z)
