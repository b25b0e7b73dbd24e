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
from .encoder import (
    BaseEncoder,
    Dirac,
    ConstDiagGaussian,
    NNDiagGaussian,
)
from .encoder import Uniform as UniformEncoder
from .decoder import BaseDecoder, NNDiagGaussianDecoder, NNBernoulliDecoder
from .prior import (
    PriorDistribution,
    ImagePrior,
    TwoModes,
    Sinusoidal,
    Sinusoidal_gap,
    Sinusoidal_split,
    Smiley,
)
from .mh_proposal import MHProposal, DiagGaussianProposal
from .linear_interpolation import LinearInterpolation
