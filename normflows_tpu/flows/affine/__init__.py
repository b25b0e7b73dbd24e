from .coupling import (
    AffineConstFlow,
    CCAffineConst,
    AffineCoupling,
    MaskedAffineFlow,
    AffineCouplingBlock,
)
