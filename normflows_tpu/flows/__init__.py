"""Flow layer zoo (reference: normflows/flows/__init__.py:1-45)."""

from ..core.flow import Flow, Reverse, Composite, Identity, ScanChain, zero_log_det_like_z
from . import base
from .planar import Planar
from .radial import Radial
from .affine.coupling import (
    AffineConstFlow,
    CCAffineConst,
    AffineCoupling,
    MaskedAffineFlow,
    AffineCouplingBlock,
)
from .normalization import ActNorm, BatchNorm
from .mixing import (
    Permute,
    Invertible1x1Conv,
    InvertibleAffine,
    LULinearPermute,
    _LULinear,
    _Permutation,
    _RandomPermutation,
)
from .reshape import Split, Merge, Squeeze
from .periodic import PeriodicWrap, PeriodicShift
from .affine.autoregressive import Autoregressive, MaskedAffineAutoregressive
from .affine.glow import GlowBlock
from .residual import Residual, iResBlock
from .stochastic import MetropolisHastings, HamiltonianMonteCarlo
from .neural_spline import (
    PiecewiseRationalQuadraticCoupling,
    PiecewiseRationalQuadraticCDF,
    MaskedPiecewiseRationalQuadraticAutoregressive,
    CoupledRationalQuadraticSpline,
    CircularCoupledRationalQuadraticSpline,
    AutoregressiveRationalQuadraticSpline,
    CircularAutoregressiveRationalQuadraticSpline,
)

__all__ = [
    "Flow",
    "Reverse",
    "Composite",
    "Identity",
    "ScanChain",
    "Planar",
    "Radial",
    "AffineConstFlow",
    "CCAffineConst",
    "AffineCoupling",
    "MaskedAffineFlow",
    "AffineCouplingBlock",
    "ActNorm",
    "BatchNorm",
    "Permute",
    "Invertible1x1Conv",
    "InvertibleAffine",
    "LULinearPermute",
    "Split",
    "Merge",
    "Squeeze",
    "PeriodicWrap",
    "PeriodicShift",
    "Autoregressive",
    "MaskedAffineAutoregressive",
    "GlowBlock",
    "Residual",
    "iResBlock",
    "MetropolisHastings",
    "HamiltonianMonteCarlo",
    "PiecewiseRationalQuadraticCoupling",
    "PiecewiseRationalQuadraticCDF",
    "MaskedPiecewiseRationalQuadraticAutoregressive",
    "CoupledRationalQuadraticSpline",
    "CircularCoupledRationalQuadraticSpline",
    "AutoregressiveRationalQuadraticSpline",
    "CircularAutoregressiveRationalQuadraticSpline",
]
