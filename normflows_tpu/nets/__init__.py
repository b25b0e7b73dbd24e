"""Parameter networks (reference: normflows/nets/__init__.py:1-17)."""

from .mlp import MLP, Linear
from .cnn import ConvNet2d, Conv2d
from .made import MADE, MaskedLinear, MaskedFeedforwardBlock, MaskedResidualBlock
from .resnet import ResidualNet, ResidualBlock, ConvResidualNet, ConvResidualBlock
from .lipschitz import (
    LipschitzMLP,
    LipschitzCNN,
    InducedNormLinear,
    InducedNormConv2d,
    Swish,
)
