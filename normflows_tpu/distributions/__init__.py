"""Distributions (reference: normflows/distributions/__init__.py:1-43)."""

from .base import (
    BaseDistribution,
    DiagGaussian,
    ConditionalDiagGaussian,
    Uniform,
    UniformGaussian,
    ClassCondDiagGaussian,
    GlowBase,
    AffineGaussian,
    GaussianMixture,
    GaussianPCA,
)
from .target import (
    Target,
    TwoIndependent,
    TwoMoons,
    CircularGaussianMixture,
    RingMixture,
    GaussianVonMises,
)
from .target import ConditionalDiagGaussian as ConditionalDiagGaussianTarget
