"""Numerical parity against the reference implementation (oracle tests).

The reference normflows (torch, ``/root/reference``) is importable in this
container; these tests build *matched* small models in both frameworks —
copying the torch parameters into our pytrees — and assert the outputs agree
to float32 tolerance.  This is the strongest parity evidence available: the
reference publishes no golden numbers (SURVEY.md §6), so the package itself
is the oracle.

Skipped automatically when the reference checkout or torch is unavailable.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")
ref_nf = pytest.importorskip("normflows")

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.ops import splines as our_splines
from normflows_tpu.nets.mlp import MLP, Linear
from normflows_tpu.nets.made import MADE

RNG = np.random.default_rng(0)


def t2j(x):
    return jnp.asarray(x.detach().cpu().numpy())


def assert_close(a, b, atol=1e-5, rtol=1e-5, msg=""):
    a = np.asarray(a)
    b = np.asarray(b) if not torch.is_tensor(b) else b.detach().cpu().numpy()
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=msg)


def copy_mlp(ref_mlp) -> MLP:
    """Map a reference nets.MLP (torch Sequential) onto our MLP pytree."""
    linears = []
    for mod in ref_mlp.net:
        if isinstance(mod, torch.nn.Linear):
            linears.append(
                Linear(weight=t2j(mod.weight).T, bias=t2j(mod.bias))
            )
    return MLP(linears=tuple(linears), leaky=0.0)


# ---------------------------------------------------------------------------
# Spline kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("tails", ["linear", "circular"])
def test_unconstrained_spline_matches_reference(tails, inverse):
    from normflows.utils import splines as ref_splines

    B, D, K = 7, 3, 8
    if tails == "circular":
        # Deliberate deviation outside the interval: the reference applies
        # identity there (splines.py:46-47; inputs are pre-wrapped by
        # PeriodicWrap in real models), while we wrap periodically — so the
        # oracle comparison is restricted to in-interval inputs.
        x = RNG.uniform(-2.9, 2.9, size=(B, D)).astype(np.float32)
    else:
        x = RNG.uniform(-4.0, 4.0, size=(B, D)).astype(np.float32)
    uw = RNG.normal(size=(B, D, K)).astype(np.float32)
    uh = RNG.normal(size=(B, D, K)).astype(np.float32)
    n_raw = K - 1 if tails == "linear" else K
    ud = RNG.normal(size=(B, D, n_raw)).astype(np.float32)

    ref_out, ref_lad = ref_splines.unconstrained_rational_quadratic_spline(
        torch.tensor(x), torch.tensor(uw), torch.tensor(uh), torch.tensor(ud),
        inverse=inverse, tails=tails, tail_bound=3.0,
    )

    # map the ragged reference layout into our uniform (K+1) slot layout
    ours_ud = np.zeros((B, D, K + 1), np.float32)
    if tails == "linear":
        ours_ud[..., 1:K] = ud
        code = our_splines.TAIL_LINEAR
    else:
        ours_ud[..., 0:K] = ud
        code = our_splines.TAIL_CIRCULAR
    out, lad = our_splines.unconstrained_rational_quadratic_spline(
        jnp.asarray(x), jnp.asarray(uw), jnp.asarray(uh), jnp.asarray(ours_ud),
        inverse=inverse, tail_codes=code, tail_bound=3.0,
    )
    assert_close(out, ref_out, atol=2e-5, rtol=2e-5, msg=f"outputs {tails}")
    assert_close(lad, ref_lad, atol=2e-4, rtol=2e-4, msg=f"logabsdet {tails}")


def test_mixed_tails_tensor_bound_matches_reference():
    """Per-dim ['linear','circular'] tails + tensor tail_bound (splines.py:48-66)."""
    from normflows.utils import splines as ref_splines

    B, K = 11, 6
    # In-interval inputs only: the reference's per-dim-tails branch
    # (splines.py:48-57) never writes the identity for outside-interval
    # elements — they keep the `torch.zeros_like` init (a reference bug; its
    # scalar-tails branches apply identity at :40-41, :46-47).  We apply the
    # intended identity, so the oracle comparison stays inside the interval.
    x = np.stack(
        [RNG.uniform(-4.9, 4.9, size=B), RNG.uniform(-3.1, 3.1, size=B)], axis=1
    ).astype(np.float32)
    uw = RNG.normal(size=(B, 2, K)).astype(np.float32)
    uh = RNG.normal(size=(B, 2, K)).astype(np.float32)
    ud = RNG.normal(size=(B, 2, K + 1)).astype(np.float32)
    bound = np.array([5.0, np.pi], np.float32)

    ref_out, ref_lad = ref_splines.unconstrained_rational_quadratic_spline(
        torch.tensor(x), torch.tensor(uw), torch.tensor(uh), torch.tensor(ud),
        inverse=True, tails=["linear", "circular"],
        tail_bound=torch.tensor(bound),
    )
    codes = np.array([our_splines.TAIL_LINEAR, our_splines.TAIL_CIRCULAR])
    out, lad = our_splines.unconstrained_rational_quadratic_spline(
        jnp.asarray(x), jnp.asarray(uw), jnp.asarray(uh), jnp.asarray(ud),
        inverse=True, tail_codes=codes, tail_bound=jnp.asarray(bound),
    )
    assert_close(out, ref_out, atol=2e-5, rtol=2e-5)
    assert_close(lad, ref_lad, atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# Simple flows
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("act", ["tanh", "leaky_relu"])
def test_planar_matches_reference(act):
    ref = ref_nf.flows.Planar((4,), act=act)
    ours = flows.Planar(u=t2j(ref.u), w=t2j(ref.w), b=t2j(ref.b), act=act)
    z = RNG.normal(size=(5, 4)).astype(np.float32)
    zr, ldr = ref(torch.tensor(z))
    zo, ldo = ours.forward(jnp.asarray(z))
    assert_close(zo, zr)
    assert_close(ldo, ldr)
    if act == "leaky_relu":
        zr, ldr = ref.inverse(torch.tensor(z))
        zo, ldo = ours.inverse(jnp.asarray(z))
        assert_close(zo, zr)
        assert_close(ldo, ldr)


def test_radial_matches_reference():
    ref = ref_nf.flows.Radial((3,))
    ours = flows.Radial(
        z_0=t2j(ref.z_0), alpha=t2j(ref.alpha), beta=t2j(ref.beta)
    )
    z = RNG.normal(size=(6, 3)).astype(np.float32)
    zr, ldr = ref(torch.tensor(z))
    zo, ldo = ours.forward(jnp.asarray(z))
    assert_close(zo, zr)
    assert_close(ldo, ldr, atol=1e-4)


def test_masked_affine_flow_with_mlp_matches_reference():
    D = 4
    b = torch.tensor([1.0, 0.0, 1.0, 0.0])
    ref_s = ref_nf.nets.MLP([D, 16, D], init_zeros=False)
    ref_t = ref_nf.nets.MLP([D, 16, D], init_zeros=False)
    ref = ref_nf.flows.MaskedAffineFlow(b, t=ref_t, s=ref_s)
    ours = flows.MaskedAffineFlow.create(
        t2j(b), t=copy_mlp(ref_t), s=copy_mlp(ref_s)
    )
    z = RNG.normal(size=(5, D)).astype(np.float32)
    for direction in ("forward", "inverse"):
        zr, ldr = getattr(ref, direction)(torch.tensor(z))
        zo, ldo = getattr(ours, direction)(jnp.asarray(z))
        assert_close(zo, zr, msg=direction)
        assert_close(ldo, ldr, msg=direction)


def test_invertible_1x1_conv_lu_matches_reference():
    C = 4
    ref = ref_nf.flows.Invertible1x1Conv(C, use_lu=True)
    ours = flows.Invertible1x1Conv(
        P=t2j(ref.P), L=t2j(ref.L), U=t2j(ref.U),
        sign_S=t2j(ref.sign_S), log_S=t2j(ref.log_S),
        num_channels=C, use_lu=True,
    )
    z = RNG.normal(size=(2, C, 3, 3)).astype(np.float32)
    zr, ldr = ref(torch.tensor(z))
    zo, ldo = ours.forward(jnp.asarray(z))
    assert_close(zo, zr, atol=1e-4, rtol=1e-4)
    assert_close(ldo, ldr.expand(2), atol=1e-4)
    zr, ldr = ref.inverse(torch.tensor(z))
    zo, ldo = ours.inverse(jnp.asarray(z))
    assert_close(zo, zr, atol=1e-4, rtol=1e-4)
    assert_close(ldo, ldr.expand(2), atol=1e-4)


def test_actnorm_init_matches_reference():
    ref = ref_nf.flows.ActNorm((3,))
    z = RNG.normal(size=(64, 3)).astype(np.float32) * 2.5 + 1.0
    zr, ldr = ref.inverse(torch.tensor(z))  # triggers data-dep init
    ours = flows.ActNorm.create((3,))
    ours, _ = ours.data_dep_init(jnp.asarray(z))
    assert_close(ours.s, ref.s)
    assert_close(ours.t, ref.t)
    zo, ldo = ours.inverse(jnp.asarray(z))
    assert_close(zo, zr, atol=1e-5)
    assert_close(ldo, ldr.expand(64) if ldr.ndim == 0 else ldr, atol=1e-5)


def test_logit_transform_matches_reference():
    ref = ref_nf.transforms.Logit(alpha=0.05)
    ours = nf.transforms.Logit(alpha=0.05)
    x = RNG.uniform(0.02, 0.98, size=(5, 6)).astype(np.float32)
    zr, ldr = ref.inverse(torch.tensor(x))
    zo, ldo = ours.inverse(jnp.asarray(x))
    assert_close(zo, zr, atol=1e-5)
    assert_close(ldo, ldr, atol=1e-4, rtol=1e-4)
    yr, ldr2 = ref(zr)
    yo, ldo2 = ours.forward(zo)
    assert_close(yo, yr, atol=1e-5)
    assert_close(ldo2, ldr2, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Distributions
# ---------------------------------------------------------------------------

def test_diag_gaussian_log_prob_matches_reference():
    ref = ref_nf.distributions.DiagGaussian(3)
    with torch.no_grad():
        ref.loc.copy_(torch.tensor([[0.3, -1.0, 2.0]]))
        ref.log_scale.copy_(torch.tensor([[0.1, -0.2, 0.4]]))
    ours = distributions.DiagGaussian.create(3).replace(
        loc=t2j(ref.loc), log_scale=t2j(ref.log_scale)
    )
    z = RNG.normal(size=(9, 3)).astype(np.float32)
    assert_close(ours.log_prob(jnp.asarray(z)), ref.log_prob(torch.tensor(z)))


def test_gaussian_mixture_log_prob_matches_reference():
    loc = RNG.normal(size=(4, 2))
    scale = np.exp(RNG.normal(size=(4, 2)) * 0.3)
    w = np.abs(RNG.normal(size=4)) + 0.1
    ref = ref_nf.distributions.GaussianMixture(4, 2, loc=loc, scale=scale, weights=w)
    ours = distributions.GaussianMixture.create(4, 2, loc=loc, scale=scale, weights=w)
    z = RNG.normal(size=(11, 2)).astype(np.float32)
    assert_close(
        ours.log_prob(jnp.asarray(z)), ref.log_prob(torch.tensor(z)), atol=1e-5
    )


def test_uniform_gaussian_log_prob_matches_reference():
    ref = ref_nf.distributions.UniformGaussian(
        2, torch.tensor([1]), torch.tensor([1.0, 2 * np.pi])
    )
    ours = distributions.UniformGaussian.create(2, [1], jnp.array([1.0, 2 * np.pi]))
    z = np.stack(
        [RNG.normal(size=31), RNG.uniform(-np.pi, np.pi, size=31)], axis=1
    ).astype(np.float32)
    assert_close(ours.log_prob(jnp.asarray(z)), ref.log_prob(torch.tensor(z)))


@pytest.mark.parametrize(
    "name,kwargs",
    [("TwoMoons", {}), ("CircularGaussianMixture", {"n_modes": 8}),
     ("RingMixture", {"n_rings": 2})],
)
def test_target_log_prob_matches_reference(name, kwargs):
    ref = getattr(ref_nf.distributions, name)(**kwargs)
    ours = getattr(distributions, name)(**kwargs) if kwargs else getattr(
        distributions, name
    )()
    z = RNG.uniform(-3.0, 3.0, size=(25, 2)).astype(np.float32)
    assert_close(
        ours.log_prob(jnp.asarray(z)), ref.log_prob(torch.tensor(z)),
        atol=1e-4, rtol=1e-4,
    )


def test_glow_base_log_prob_matches_reference():
    ref = ref_nf.distributions.GlowBase((3, 4, 4))
    ours = distributions.GlowBase.create((3, 4, 4))
    ours = ours.replace(
        loc=t2j(ref.loc), loc_logs=t2j(ref.loc_logs),
        log_scale=t2j(ref.log_scale), log_scale_logs=t2j(ref.log_scale_logs),
    )
    z = RNG.normal(size=(5, 3, 4, 4)).astype(np.float32)
    assert_close(
        ours.log_prob(jnp.asarray(z)), ref.log_prob(torch.tensor(z)), atol=1e-4
    )


# ---------------------------------------------------------------------------
# MADE (mask construction + full net)
# ---------------------------------------------------------------------------

def test_made_masks_match_reference():
    ref = ref_nf.nets.MADE(features=5, hidden_features=32, num_blocks=2,
                           output_multiplier=3)
    ours = MADE.create(jax.random.key(0), 5, 32, num_blocks=2, output_multiplier=3)
    assert_close(ours.initial_layer.mask, ref.initial_layer.mask.T)
    for ob, rb in zip(ours.blocks, ref.blocks):
        assert_close(ob.linear_0.mask, rb.linear_layers[0].mask.T)
        assert_close(ob.linear_1.mask, rb.linear_layers[1].mask.T)
    assert_close(ours.final_layer.mask, ref.final_layer.mask.T)


def test_made_output_matches_reference():
    ref = ref_nf.nets.MADE(features=4, hidden_features=16, num_blocks=2,
                           output_multiplier=2)
    ours = MADE.create(jax.random.key(0), 4, 16, num_blocks=2, output_multiplier=2)

    def copy_masked(our_lin, ref_lin):
        return our_lin.replace(
            weight=t2j(ref_lin.weight).T, bias=t2j(ref_lin.bias)
        )

    blocks = tuple(
        ob.replace(
            linear_0=copy_masked(ob.linear_0, rb.linear_layers[0]),
            linear_1=copy_masked(ob.linear_1, rb.linear_layers[1]),
        )
        for ob, rb in zip(ours.blocks, ref.blocks)
    )
    ours = ours.replace(
        initial_layer=copy_masked(ours.initial_layer, ref.initial_layer),
        blocks=blocks,
        final_layer=copy_masked(ours.final_layer, ref.final_layer),
    )
    x = RNG.normal(size=(7, 4)).astype(np.float32)
    assert_close(ours(jnp.asarray(x)), ref(torch.tensor(x)), atol=1e-5)


# ---------------------------------------------------------------------------
# End-to-end model oracle: Real NVP forward_kld
# ---------------------------------------------------------------------------

def test_realnvp_forward_kld_matches_reference():
    D, K = 2, 4
    b = torch.tensor([1.0, 0.0])
    ref_flows, our_flows = [], []
    for i in range(K):
        s = ref_nf.nets.MLP([D, 16, D], init_zeros=True)
        t = ref_nf.nets.MLP([D, 16, D], init_zeros=False)
        mask = b if i % 2 == 0 else 1 - b
        ref_flows.append(ref_nf.flows.MaskedAffineFlow(mask, t=t, s=s))
        our_flows.append(
            flows.MaskedAffineFlow.create(t2j(mask), t=copy_mlp(t), s=copy_mlp(s))
        )
    ref_model = ref_nf.NormalizingFlow(ref_nf.distributions.DiagGaussian(D), ref_flows)
    our_model = nf.NormalizingFlow.create(
        distributions.DiagGaussian.create(D), our_flows
    )
    x = RNG.normal(size=(32, D)).astype(np.float32) * 1.5
    ref_loss = ref_model.forward_kld(torch.tensor(x))
    our_loss = our_model.forward_kld(jnp.asarray(x))
    assert_close(our_loss, ref_loss, atol=1e-5, rtol=1e-5)
    # per-sample log_prob too
    assert_close(
        our_model.log_prob(jnp.asarray(x)), ref_model.log_prob(torch.tensor(x)),
        atol=1e-5, rtol=1e-5,
    )
