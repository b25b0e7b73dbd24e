"""Parameter networks (reference: normflows/nets/__init__.py:1-17)."""

from .mlp import MLP, Linear
