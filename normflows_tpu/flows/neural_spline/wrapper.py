"""User-facing NSF constructors (reference: normflows/flows/neural_spline/wrapper.py).

Note the direction flip: model-forward (sampling) maps to the inner
transform's *inverse* (wrapper.py:79-85, 238-244), so density evaluation is
the cheap single-pass direction for the AR variants.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Module, static_field
from ...core.flow import Flow
from ...nets.resnet import ResidualNet
from ...utils.masks import create_alternating_binary_mask
from ...utils.nn import PeriodicFeaturesElementwise
from ...ops.splines import DEFAULT_MIN_DERIVATIVE
from .coupling import PiecewiseRationalQuadraticCoupling
from .autoregressive import MaskedPiecewiseRationalQuadraticAutoregressive


def _identity_init_resnet(net):
    constant = float(np.log(np.exp(1 - DEFAULT_MIN_DERIVATIVE) - 1))
    return net.replace(
        final_layer=net.final_layer.replace(
            weight=jnp.zeros_like(net.final_layer.weight),
            bias=jnp.full_like(net.final_layer.bias, constant),
        )
    )


class CoupledRationalQuadraticSpline(Flow):
    """NSF coupling layer (wrapper.py:14-85)."""

    prqct: PiecewiseRationalQuadraticCoupling

    @classmethod
    def create(
        cls,
        key,
        num_input_channels: int,
        num_blocks: int,
        num_hidden_channels: int,
        num_context_channels=None,
        num_bins: int = 8,
        tails="linear",
        tail_bound: float = 3.0,
        activation: str = "relu",
        reverse_mask: bool = False,
        dropout_probability: float = 0.0,
        init_identity: bool = True,
    ):
        def transform_net_create_fn(in_features, out_features):
            net = ResidualNet.create(
                key,
                in_features=in_features,
                out_features=out_features,
                context_features=num_context_channels,
                hidden_features=num_hidden_channels,
                num_blocks=num_blocks,
                activation=activation,
                dropout_probability=dropout_probability,
            )
            return _identity_init_resnet(net) if init_identity else net

        prqct = PiecewiseRationalQuadraticCoupling.create(
            mask=np.asarray(
                create_alternating_binary_mask(num_input_channels, even=reverse_mask)
            ),
            transform_net_create_fn=transform_net_create_fn,
            num_bins=num_bins,
            tails=tails,
            tail_bound=tail_bound,
            # True corresponds to eqs (4)-(6) of the NSF paper (wrapper.py:75-77)
            apply_unconditional_transform=True,
        )
        return cls(prqct=prqct)

    def forward(self, z, context=None, *, key=None):
        return self.prqct.inverse(z, context, key=key)

    def inverse(self, z, context=None, *, key=None):
        return self.prqct.forward(z, context, key=key)


class CircularCoupledRationalQuadraticSpline(Flow):
    """NSF coupling layer with circular coordinates (wrapper.py:88-183)."""

    prqct: PiecewiseRationalQuadraticCoupling

    @classmethod
    def create(
        cls,
        key,
        num_input_channels: int,
        num_blocks: int,
        num_hidden_channels: int,
        ind_circ,
        num_context_channels=None,
        num_bins: int = 8,
        tail_bound=3.0,
        activation: str = "relu",
        reverse_mask: bool = False,
        mask=None,
        dropout_probability: float = 0.0,
        init_identity: bool = True,
    ):
        if mask is None:
            mask = np.asarray(
                create_alternating_binary_mask(num_input_channels, even=reverse_mask)
            )
        mask = np.asarray(mask)
        identity_features = np.nonzero(mask <= 0)[0]
        ind_circ = list(np.asarray(ind_circ).reshape(-1))
        # positions of circular dims within the identity split (wrapper.py:131-134)
        ind_circ_id = [
            i for i, idx in enumerate(identity_features) if idx in ind_circ
        ]
        tb = np.asarray(tail_bound, np.float32)
        if tb.ndim > 0:
            scale_pf = np.pi / tb[np.asarray(identity_features)[ind_circ_id]]
        else:
            scale_pf = np.pi / float(tail_bound)

        def transform_net_create_fn(in_features, out_features):
            pf = (
                PeriodicFeaturesElementwise.create(in_features, ind_circ_id, scale_pf)
                if ind_circ_id
                else None
            )
            net = ResidualNet.create(
                key,
                in_features=in_features,
                out_features=out_features,
                context_features=num_context_channels,
                hidden_features=num_hidden_channels,
                num_blocks=num_blocks,
                activation=activation,
                dropout_probability=dropout_probability,
                preprocessing=pf,
            )
            return _identity_init_resnet(net) if init_identity else net

        tails = [
            "circular" if i in ind_circ else "linear"
            for i in range(num_input_channels)
        ]
        prqct = PiecewiseRationalQuadraticCoupling.create(
            mask=mask,
            transform_net_create_fn=transform_net_create_fn,
            num_bins=num_bins,
            tails=tails,
            tail_bound=tail_bound,
            apply_unconditional_transform=True,
        )
        return cls(prqct=prqct)

    def forward(self, z, context=None, *, key=None):
        return self.prqct.inverse(z, context, key=key)

    def inverse(self, z, context=None, *, key=None):
        return self.prqct.forward(z, context, key=key)


class AutoregressiveRationalQuadraticSpline(Flow):
    """NSF autoregressive layer (wrapper.py:186-244)."""

    mprqat: MaskedPiecewiseRationalQuadraticAutoregressive

    @classmethod
    def create(
        cls,
        key,
        num_input_channels: int,
        num_blocks: int,
        num_hidden_channels: int,
        num_context_channels=None,
        num_bins: int = 8,
        tail_bound: float = 3.0,
        activation: str = "relu",
        permute_mask: bool = False,
        dropout_probability: float = 0.0,
        init_identity: bool = True,
        rng_seed: int = 0,
    ):
        mprqat = MaskedPiecewiseRationalQuadraticAutoregressive.create(
            key,
            features=num_input_channels,
            hidden_features=num_hidden_channels,
            context_features=num_context_channels,
            num_bins=num_bins,
            tails="linear",
            tail_bound=tail_bound,
            num_blocks=num_blocks,
            use_residual_blocks=True,
            random_mask=False,
            permute_mask=permute_mask,
            activation=activation,
            dropout_probability=dropout_probability,
            init_identity=init_identity,
            rng_seed=rng_seed,
        )
        return cls(mprqat=mprqat)

    def forward(self, z, context=None, *, key=None):
        return self.mprqat.inverse(z, context, key=key)

    def inverse(self, z, context=None, *, key=None):
        return self.mprqat.forward(z, context, key=key)


class CircularAutoregressiveRationalQuadraticSpline(Flow):
    """Circular NSF autoregressive layer (wrapper.py:247-311)."""

    mprqat: MaskedPiecewiseRationalQuadraticAutoregressive

    @classmethod
    def create(
        cls,
        key,
        num_input_channels: int,
        num_blocks: int,
        num_hidden_channels: int,
        ind_circ,
        num_context_channels=None,
        num_bins: int = 8,
        tail_bound=3.0,
        activation: str = "relu",
        permute_mask: bool = True,
        dropout_probability: float = 0.0,
        init_identity: bool = True,
        rng_seed: int = 0,
    ):
        ind_circ = list(np.asarray(ind_circ).reshape(-1))
        tails = [
            "circular" if i in ind_circ else "linear"
            for i in range(num_input_channels)
        ]
        mprqat = MaskedPiecewiseRationalQuadraticAutoregressive.create(
            key,
            features=num_input_channels,
            hidden_features=num_hidden_channels,
            context_features=num_context_channels,
            num_bins=num_bins,
            tails=tails,
            tail_bound=tail_bound,
            num_blocks=num_blocks,
            use_residual_blocks=True,
            random_mask=False,
            permute_mask=permute_mask,
            activation=activation,
            dropout_probability=dropout_probability,
            init_identity=init_identity,
            rng_seed=rng_seed,
        )
        return cls(mprqat=mprqat)

    def forward(self, z, context=None, *, key=None):
        return self.mprqat.inverse(z, context, key=key)

    def inverse(self, z, context=None, *, key=None):
        return self.mprqat.forward(z, context, key=key)
