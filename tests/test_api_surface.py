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


# ---------------------------------------------------------------------------
# Signature-level compatibility
# ---------------------------------------------------------------------------

import inspect


def _ctor_params(cls):
    """Parameter names a class's constructor accepts.  For our Modules the
    constructor surface is the `create` classmethod when present (the
    documented build path), else the dataclass __init__."""
    fn = getattr(cls, "create", None)
    if fn is None or not callable(fn):
        fn = cls.__init__
    sig = inspect.signature(fn)
    names = set()
    has_var_kw = False
    for p in sig.parameters.values():
        if p.name in ("self", "cls"):
            continue
        if p.kind is inspect.Parameter.VAR_KEYWORD:
            has_var_kw = True
        elif p.kind is not inspect.Parameter.VAR_POSITIONAL:
            names.add(p.name)
    return names, has_var_kw


# Documented deviations: {class name: {ref param: reason}} — each entry is a
# deliberate TPU-first API change, not an accidental omission.
SIGNATURE_WAIVERS = {
    # The reference's distributions/__init__.py re-exports BOTH base.Uniform
    # (shape, low, high) and encoder.Uniform (zmin, zmax) under the same
    # name; import order makes the VAE-encoder variant win.  We export the
    # base distribution (the far more used one) and keep the encoder variant
    # at normflows_tpu.distributions.encoder.Uniform.
    "Uniform": {"zmin": "encoder-variant shadowing", "zmax": "encoder-variant shadowing"},
}


def _collect_class_pairs():
    out = []
    for rname, oname in PAIRS:
        ref = importlib.import_module(rname)
        ours = importlib.import_module(oname)
        for n in dir(ref):
            if n.startswith("_"):
                continue
            rcls = getattr(ref, n)
            if not inspect.isclass(rcls) or not hasattr(ours, n):
                continue
            ocls = getattr(ours, n)
            if not inspect.isclass(ocls):
                continue
            out.append(pytest.param(rcls, ocls, id=f"{rname}.{n}"))
    return out


@pytest.mark.parametrize("rcls,ocls", _collect_class_pairs())
def test_constructor_signature_compat(rcls, ocls):
    """Every kwarg the reference constructor accepts must be accepted by our
    constructor under the same name (so reference call sites port verbatim),
    modulo the documented waiver list.  Extra parameters on our side (e.g.
    explicit `key`) are always allowed."""
    try:
        ref_sig = inspect.signature(rcls.__init__)
    except (ValueError, TypeError):
        pytest.skip("reference constructor has no inspectable signature")
    ref_params = [
        p.name for p in ref_sig.parameters.values()
        if p.name != "self" and p.kind not in (
            inspect.Parameter.VAR_POSITIONAL, inspect.Parameter.VAR_KEYWORD)
    ]
    our_params, has_var_kw = _ctor_params(ocls)
    if has_var_kw:
        return
    waived = SIGNATURE_WAIVERS.get(rcls.__name__, {})
    missing = [p for p in ref_params if p not in our_params and p not in waived]
    assert not missing, (
        f"{ocls.__module__}.{ocls.__name__} constructor does not accept "
        f"reference parameters {missing} (ref: {sorted(ref_params)}; "
        f"ours: {sorted(our_params)})"
    )
