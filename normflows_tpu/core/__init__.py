from .module import Module, static_field, buffer_field, partition, combine
from .flow import Flow, Reverse, Composite, ScanChain, Identity, sum_except_batch
from .facades import (
    NormalizingFlow,
    ConditionalNormalizingFlow,
    ClassCondFlow,
    MultiscaleFlow,
    NormalizingFlowVAE,
)
