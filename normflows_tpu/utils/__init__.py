"""Utilities (reference: normflows/utils/__init__.py:1-17)."""

from . import masks, nn, eval, preprocessing, optim, splines, profiling
from .eval import bits_per_dim, bits_per_dim_dataset, bitsPerDim, bitsPerDimDataset
from .optim import update_lipschitz, set_requires_grad, clear_grad
from .precision import set_compute_dtype
from .cache import enable_compilation_cache
from .nn import ActNorm, ClampExp, ConstScaleLayer, tile, sum_except_batch
from .preprocessing import Logit, Jitter, Scale
from .nn import (
    ConstScaleLayer,
    ClampExp,
    PeriodicFeaturesElementwise,
    PeriodicFeaturesCat,
    tile,
    sum_except_batch,
)
from .masks import (
    create_alternating_binary_mask,
    create_mid_split_binary_mask,
    create_random_binary_mask,
)
