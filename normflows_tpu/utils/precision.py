"""Mixed-precision control.

Flows need f32 state for invertibility, but the parameter-net matmuls/convs —
where the FLOPs are — can run in bfloat16 on the MXU with f32 accumulation.
``set_compute_dtype(model, "bfloat16")`` flips every Linear/MaskedLinear/Conv2d
in the tree; activations outside the matmul stay f32.
"""

from __future__ import annotations

import dataclasses

from ..core.module import Module


def set_compute_dtype(model, dtype):
    """Return a copy of ``model`` with matmul/conv compute dtype set.

    ``dtype``: "bfloat16", "float32", or None (full precision).
    """
    from ..nets.mlp import Linear
    from ..nets.made import MaskedLinear
    from ..nets.cnn import Conv2d

    targets = (Linear, MaskedLinear, Conv2d)

    def rec(x):
        if isinstance(x, targets):
            return x.replace(compute_dtype=dtype)
        if isinstance(x, Module):
            changes = {}
            for f in dataclasses.fields(x):
                if f.metadata.get("nf_static"):
                    continue
                val = getattr(x, f.name)
                new_val = rec(val)
                if new_val is not val:
                    changes[f.name] = new_val
            return x.replace(**changes) if changes else x
        if isinstance(x, tuple):
            return tuple(rec(v) for v in x)
        if isinstance(x, list):
            return [rec(v) for v in x]
        if isinstance(x, dict):
            return {k: rec(v) for k, v in x.items()}
        return x

    return rec(model)
