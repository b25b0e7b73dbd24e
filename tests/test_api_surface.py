"""API-surface completeness vs the reference package.

Every public name the reference exports (flows, distributions, nets, utils,
transforms, sampling, and the root facades) must exist in the corresponding
normflows_tpu module — the "a user of the reference finds everything they
need" contract, enforced mechanically.  Skipped when the reference checkout
is unavailable.
"""

import importlib
import sys
import types

import pytest

# Append (not prepend) so the reference checkout cannot shadow same-named
# modules for other tests collected in the same session; the reference's
# `normflows` package name collides with nothing in this repo.
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")
pytest.importorskip("torch")
pytest.importorskip("normflows")

PAIRS = [
    ("normflows", "normflows_tpu"),
    ("normflows.flows", "normflows_tpu.flows"),
    ("normflows.distributions", "normflows_tpu.distributions"),
    ("normflows.nets", "normflows_tpu.nets"),
    ("normflows.utils", "normflows_tpu.utils"),
    ("normflows.transforms", "normflows_tpu.transforms"),
    ("normflows.sampling", "normflows_tpu.sampling"),
]

# lower-case reference functions that are part of the public surface
LOWER_CASE_API = {
    "bitsPerDim", "bitsPerDimDataset", "set_requires_grad", "clear_grad",
    "update_lipschitz", "tile", "sum_except_batch",
}


@pytest.mark.parametrize("rname,oname", PAIRS)
def test_every_reference_export_exists(rname, oname):
    ref = importlib.import_module(rname)
    ours = importlib.import_module(oname)
    public = {
        n for n in dir(ref)
        if not n.startswith("_") and (n[0].isupper() or n in LOWER_CASE_API)
        and not isinstance(getattr(ref, n), types.ModuleType)
    }
    missing = sorted(n for n in public if not hasattr(ours, n))
    assert not missing, f"{oname} is missing reference exports: {missing}"
