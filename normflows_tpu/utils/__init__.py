"""Utilities (reference: normflows/utils/__init__.py:1-17)."""

from . import masks, nn
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
