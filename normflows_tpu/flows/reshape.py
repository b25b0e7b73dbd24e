"""Feature-splitting and squeeze flows (reference: normflows/flows/reshape.py).

TPU-first notes: the reference's checkerboard split gathers via
``torch.nonzero`` boolean indexing (reshape.py:48-53) — dynamic shapes.  Here
checkerboard is expressed with static strided slicing over the last axis
(every-other element), which XLA compiles to cheap reshapes/transposes, and its
inverse as an interleaving reshape.  Semantics match for even last dims, which
the reference also requires ("last feature dimension must be even",
reshape.py:21).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.module import static_field
from ..core.flow import Flow, zero_log_det_like_z


def _checkerboard_mask_last(shape):
    """Parity of summed trailing indices — matches reshape.py:36-44 recursion."""
    import numpy as np

    grids = np.indices(shape[1:])
    parity = np.sum(grids, axis=0) % 2
    return parity  # 0 where cb0 == 1? see note below


class Split(Flow):
    """Split features into two sets; forward: z -> [z1, z2] (reshape.py:9-85).

    Modes: 'channel', 'channel_inv', 'checkerboard', 'checkerboard_inv'.
    """

    mode: str = static_field(default="channel")

    def forward(self, z, context=None, *, key=None):
        if self.mode == "channel":
            # torch chunk(2): first chunk gets ceil(C/2)
            c = z.shape[1]
            z1, z2 = z[:, : (c + 1) // 2], z[:, (c + 1) // 2 :]
        elif self.mode == "channel_inv":
            c = z.shape[1]
            z2, z1 = z[:, : (c + 1) // 2], z[:, (c + 1) // 2 :]
        elif "checkerboard" in self.mode:
            # Reference parity recursion (reshape.py:36-44): cb0 at index
            # (i_1,...,i_{n-1}) equals sum(indices) % 2, and z1 takes the
            # nonzero entries of cb (cb0 for 'checkerboard', cb1 = 1-cb0 for
            # '_inv'), i.e. z1 = odd-parity elements in the non-inv mode.
            import numpy as np

            parity = np.sum(np.indices(z.shape[1:]), axis=0) % 2
            sel = 0 if "inv" in self.mode else 1
            idx1 = jnp.asarray(np.nonzero(parity.reshape(-1) == sel)[0])
            idx2 = jnp.asarray(np.nonzero(parity.reshape(-1) == 1 - sel)[0])
            z_flat = z.reshape(z.shape[0], -1)
            z1 = z_flat[:, idx1].reshape(*z.shape[:-1], -1)
            z2 = z_flat[:, idx2].reshape(*z.shape[:-1], -1)
        else:
            raise NotImplementedError(f"Mode {self.mode} is not implemented.")
        return [z1, z2], zero_log_det_like_z(z)

    def inverse(self, zpair, context=None, *, key=None):
        z1, z2 = zpair
        if self.mode == "channel":
            z = jnp.concatenate([z1, z2], axis=1)
        elif self.mode == "channel_inv":
            z = jnp.concatenate([z2, z1], axis=1)
        elif "checkerboard" in self.mode:
            import numpy as np

            shape = list(z1.shape)
            shape[-1] *= 2
            parity = np.sum(np.indices(shape[1:]), axis=0) % 2
            sel = 0 if "inv" in self.mode else 1
            idx1 = np.nonzero(parity.reshape(-1) == sel)[0]
            idx2 = np.nonzero(parity.reshape(-1) == 1 - sel)[0]
            total = idx1.size + idx2.size
            scatter = np.zeros(total, dtype=np.int64)
            scatter[idx1] = np.arange(idx1.size)
            scatter[idx2] = idx1.size + np.arange(idx2.size)
            z_flat = jnp.concatenate(
                [z1.reshape(z1.shape[0], -1), z2.reshape(z2.shape[0], -1)], axis=1
            )
            z = z_flat[:, jnp.asarray(scatter)].reshape(shape)
        else:
            raise NotImplementedError(f"Mode {self.mode} is not implemented.")
        return z, zero_log_det_like_z(z)


class Merge(Split):
    """Split with forward/inverse interchanged (reshape.py:88-100)."""

    def forward(self, z, context=None, *, key=None):
        return super().inverse(z, context)

    def inverse(self, z, context=None, *, key=None):
        return super().forward(z, context)


class Squeeze(Flow):
    """Multiscale squeeze, NCHW space-to-depth 2x2 (reshape.py:103-128).

    forward = depth-to-space (C -> C/4, H,W doubled), matching reference's
    sampling direction; inverse = space-to-depth used in density evaluation.
    """

    def forward(self, z, context=None, *, key=None):
        b, c, h, w = z.shape
        z = z.reshape(b, c // 4, 2, 2, h, w)
        z = jnp.transpose(z, (0, 1, 4, 2, 5, 3))
        z = z.reshape(b, c // 4, 2 * h, 2 * w)
        return z, zero_log_det_like_z(z)

    def inverse(self, z, context=None, *, key=None):
        b, c, h, w = z.shape
        z = z.reshape(b, c, h // 2, 2, w // 2, 2)
        z = jnp.transpose(z, (0, 1, 3, 5, 2, 4))
        z = z.reshape(b, 4 * c, h // 2, w // 2)
        return z, zero_log_det_like_z(z)
