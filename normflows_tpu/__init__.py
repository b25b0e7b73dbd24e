"""normflows_tpu — TPU-native normalizing-flow framework (JAX/XLA/Pallas).

Brand-new implementation with the capability surface of `normflows`
(VincentStimper/normalizing-flows); see SURVEY.md.  Public API mirrors the
reference's package root (reference normflows/__init__.py:4-12) so users can
translate code 1:1, but all models are pure-functional pytrees.
"""

from . import (
    core,
    flows,
    distributions,
    nets,
    utils,
    transforms,
    ops,
    sampling,
    parallel,
    training,
    data,
)
from .core.module import (
    Module,
    static_field,
    buffer_field,
    partition,
    combine,
    trainable_filter,
)
from .core.flow import Flow, Reverse, Composite, ScanChain, Identity
from .core.facades import (
    NormalizingFlow,
    ConditionalNormalizingFlow,
    ClassCondFlow,
    MultiscaleFlow,
    NormalizingFlowVAE,
    save_model,
    load_model,
)
from .sampling import HAIS

__version__ = "0.1.0"
