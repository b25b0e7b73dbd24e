from .coupling import (
    Coupling,
    PiecewiseRationalQuadraticCoupling,
    PiecewiseRationalQuadraticCDF,
)
from .autoregressive import MaskedPiecewiseRationalQuadraticAutoregressive
from .wrapper import (
    CoupledRationalQuadraticSpline,
    CircularCoupledRationalQuadraticSpline,
    AutoregressiveRationalQuadraticSpline,
    CircularAutoregressiveRationalQuadraticSpline,
)
