"""GlowBlock (reference: normflows/flows/affine/glow.py:11-84)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.flow import Flow, zero_log_det_like_z
from ...core.module import static_field
from ...nets.cnn import ConvNet2d
from ..mixing import Invertible1x1Conv
from ..normalization import ActNorm
from .coupling import AffineCouplingBlock


class GlowBlock(Flow):
    """AffineCouplingBlock(ConvNet2d) + Invertible1x1Conv + ActNorm.

    Channel arithmetic for the coupling param net follows glow.py:51-61,
    including odd channel counts and the checkerboard mode.
    """

    flows: tuple

    @classmethod
    def create(
        cls,
        key,
        channels: int,
        hidden_channels: int,
        scale: bool = True,
        scale_map: str = "sigmoid",
        split_mode: str = "channel",
        leaky: float = 0.0,
        init_zeros: bool = True,
        use_lu: bool = True,
        net_actnorm: bool = False,
    ):
        kc, ki = jax.random.split(key)
        kernel_size = (3, 1, 3)
        num_param = 2 if scale else 1
        if split_mode == "channel":
            channels_ = ((channels + 1) // 2,) + 2 * (hidden_channels,)
            channels_ += (num_param * (channels // 2),)
        elif split_mode == "channel_inv":
            channels_ = (channels // 2,) + 2 * (hidden_channels,)
            channels_ += (num_param * ((channels + 1) // 2),)
        elif "checkerboard" in split_mode:
            channels_ = (channels,) + 2 * (hidden_channels,)
            channels_ += (num_param * channels,)
        else:
            raise NotImplementedError(f"Mode {split_mode} is not implemented.")
        param_map = ConvNet2d.create(
            kc, channels_, kernel_size, leaky, init_zeros, actnorm=net_actnorm
        )
        layers = [AffineCouplingBlock.create(param_map, scale, scale_map, split_mode)]
        if channels > 1:
            layers.append(Invertible1x1Conv.create(channels, use_lu, key=ki))
        layers.append(ActNorm.create((channels, 1, 1)))
        return cls(flows=tuple(layers))

    def forward(self, z, context=None, *, key=None):
        log_det = zero_log_det_like_z(z)
        for flow in self.flows:
            z, ld = flow.forward(z)
            log_det = log_det + ld
        return z, log_det

    def inverse(self, z, context=None, *, key=None):
        log_det = zero_log_det_like_z(z)
        for flow in reversed(self.flows):
            z, ld = flow.inverse(z)
            log_det = log_det + ld
        return z, log_det

    def data_dep_init(self, z, context=None):
        new_flows = []
        for flow in reversed(self.flows):
            flow, z = flow.data_dep_init(z, context)
            new_flows.append(flow)
        return self.replace(flows=tuple(reversed(new_flows))), z
