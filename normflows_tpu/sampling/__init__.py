from .hais import HAIS
from .adaptation import adapt_step_size, dual_averaging_init, dual_averaging_update
from .smc import AnnealedSMC, systematic_resample, effective_sample_size
from .neutra import NeuTraHMC, PullbackTarget
from .nuts import NUTS
