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
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")
ref_nf = pytest.importorskip("normflows")

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.ops import splines as our_splines
from normflows_tpu.nets.mlp import MLP, Linear
from normflows_tpu.nets.made import MADE

RNG = np.random.default_rng(0)


def t2j(x):
    # jnp.array with copy=True: jnp.asarray can alias the torch tensor's
    # memory (zero-copy dlpack on CPU), so a reference-side IN-PLACE buffer
    # mutation (e.g. power iteration's normalize(..., out=u)) would silently
    # mutate the "copied" JAX state too.
    return jnp.array(x.detach().cpu().numpy(), copy=True)


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


def test_glow_base_class_cond_and_temperature_match_reference():
    """GlowBase class-conditional offsets (base.py:380-397) and temperature
    annealing (base.py:424-425) on the log_prob path."""
    C = 4
    torch.manual_seed(47)
    ref = ref_nf.distributions.GlowBase((3, 4, 4), num_classes=C)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.2 * torch.randn_like(p))
    ours = distributions.GlowBase.create((3, 4, 4), num_classes=C)
    ours = ours.replace(
        loc=t2j(ref.loc), loc_logs=t2j(ref.loc_logs),
        log_scale=t2j(ref.log_scale), log_scale_logs=t2j(ref.log_scale_logs),
        loc_cc=t2j(ref.loc_cc), log_scale_cc=t2j(ref.log_scale_cc),
    )
    z = RNG.normal(size=(6, 3, 4, 4)).astype(np.float32)
    y = RNG.integers(0, C, size=6)
    assert_close(
        ours.log_prob(jnp.asarray(z), jnp.asarray(y)),
        ref.log_prob(torch.tensor(z), torch.tensor(y)), atol=1e-4,
    )
    ref.temperature = 0.7
    ours_t = ours.replace(temperature=0.7)
    assert_close(
        ours_t.log_prob(jnp.asarray(z), jnp.asarray(y)),
        ref.log_prob(torch.tensor(z), torch.tensor(y)), atol=1e-4,
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


# ---------------------------------------------------------------------------
# Training-objective estimators: value AND gradient oracle parity
#
# Reference: core.py:104-131 (reverse_kld incl. sticking-the-landing via
# set_requires_grad(False)), core.py:133-165 (reverse_alpha_div incl. DReG).
# Stochasticity is factored out by injecting IDENTICAL base samples into both
# frameworks (fixed-eps DiagGaussian subclasses); gradients are where the
# STL/DReG estimators differ from the naive ones, so both are asserted.
# ---------------------------------------------------------------------------

class _FixedEpsDiagGaussian(distributions.DiagGaussian):
    """Test-only base: reparametrized sample with a pre-drawn eps buffer."""

    eps: jnp.ndarray = None

    def sample_and_log_prob(self, key, num_samples: int = 1, context=None):
        eps = self.eps[:num_samples]
        z = self.loc + jnp.exp(self.log_scale) * eps
        axes = tuple(range(1, eps.ndim))
        log_p = -0.5 * self.d * np.log(2 * np.pi) - jnp.sum(
            self.log_scale + 0.5 * eps**2, axis=axes
        )
        return z, log_p


def _make_ref_fixed_eps_base(D, eps_t):
    class RefFixedEps(ref_nf.distributions.DiagGaussian):
        def forward(self, num_samples=1, context=None):
            eps = eps_t[:num_samples]
            z = self.loc + torch.exp(self.log_scale) * eps
            log_p = -0.5 * self.d * np.log(2 * np.pi) - torch.sum(
                self.log_scale + 0.5 * eps**2, list(range(1, self.n_dim + 1))
            )
            return z, log_p

    return RefFixedEps(D)


def _build_estimator_pair(N=64, D=2, K=4):
    """Weight-copied Real NVP pair with identical injected base samples."""
    eps = RNG.normal(size=(N, D)).astype(np.float32)
    b = torch.tensor([1.0, 0.0])
    ref_flows, our_flows = [], []
    for i in range(K):
        s = ref_nf.nets.MLP([D, 16, D], init_zeros=False)
        t = ref_nf.nets.MLP([D, 16, D], init_zeros=False)
        # keep scales tame so exp() stays well-conditioned for grad checks
        with torch.no_grad():
            for m in s.net:
                if isinstance(m, torch.nn.Linear):
                    m.weight *= 0.3
        mask = b if i % 2 == 0 else 1 - b
        ref_flows.append(ref_nf.flows.MaskedAffineFlow(mask, t=t, s=s))
        our_flows.append(
            flows.MaskedAffineFlow.create(t2j(mask), t=copy_mlp(t), s=copy_mlp(s))
        )
    ref_model = ref_nf.NormalizingFlow(
        _make_ref_fixed_eps_base(D, torch.tensor(eps)),
        ref_flows,
        p=ref_nf.distributions.TwoMoons(),
    )
    our_base = _FixedEpsDiagGaussian(
        loc=jnp.zeros((1, D)),
        log_scale=jnp.zeros((1, D)),
        shape=(D,),
        eps=jnp.asarray(eps),
    )
    our_model = nf.NormalizingFlow.create(
        our_base, our_flows, p=distributions.TwoMoons()
    )
    return ref_model, our_model, N


def _assert_grads_match(our_grad_model, ref_model, K, atol, rtol):
    """Compare our jax.grad pytree against torch .grad, leaf by leaf."""
    assert_close(
        our_grad_model.q0.loc, ref_model.q0.loc.grad, atol=atol, rtol=rtol,
        msg="q0.loc grad",
    )
    assert_close(
        our_grad_model.q0.log_scale, ref_model.q0.log_scale.grad,
        atol=atol, rtol=rtol, msg="q0.log_scale grad",
    )
    for i in range(K):
        for name in ("t", "s"):
            ref_net = getattr(ref_model.flows[i], name)
            our_net = getattr(our_grad_model.flows[i], name + "_net")
            ref_linears = [
                m for m in ref_net.net if isinstance(m, torch.nn.Linear)
            ]
            for j, (our_lin, ref_lin) in enumerate(
                zip(our_net.linears, ref_linears)
            ):
                assert_close(
                    our_lin.weight, ref_lin.weight.grad.T, atol=atol, rtol=rtol,
                    msg=f"flows[{i}].{name}.linears[{j}].weight grad",
                )
                assert_close(
                    our_lin.bias, ref_lin.bias.grad, atol=atol, rtol=rtol,
                    msg=f"flows[{i}].{name}.linears[{j}].bias grad",
                )


@pytest.mark.parametrize(
    "beta,score_fn", [(1.0, True), (0.7, True), (1.0, False), (0.7, False)]
)
def test_reverse_kld_value_and_grad_match_reference(beta, score_fn):
    """core.py:104-131 — incl. the sticking-the-landing (score_fn=False)
    path-gradient estimator, whose re-inverse pass must stop parameter
    gradients but NOT the gradient through the sampled z."""
    K = 4
    ref_model, our_model, N = _build_estimator_pair(K=K)

    ref_loss = ref_model.reverse_kld(N, beta=beta, score_fn=score_fn)
    ref_model.zero_grad()
    ref_loss.backward()

    def loss_fn(m):
        return m.reverse_kld(
            jax.random.key(0), N, beta=beta, score_fn=score_fn
        )

    our_loss, our_grads = jax.value_and_grad(loss_fn)(our_model)
    assert_close(our_loss, ref_loss, atol=1e-5, rtol=1e-5)
    _assert_grads_match(our_grads, ref_model, K, atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("alpha,dreg", [(0.5, False), (2.0, False), (0.5, True)])
def test_reverse_alpha_div_value_and_grad_match_reference(alpha, dreg):
    """core.py:133-165 — alpha-divergence incl. the DReG doubly-reparametrized
    estimator (stop-grad importance weights + parameter-stopped re-pass)."""
    K = 4
    ref_model, our_model, N = _build_estimator_pair(K=K)

    ref_loss = ref_model.reverse_alpha_div(N, alpha=alpha, dreg=dreg)
    ref_model.zero_grad()
    ref_loss.backward()

    def loss_fn(m):
        return m.reverse_alpha_div(jax.random.key(0), N, alpha=alpha, dreg=dreg)

    our_loss, our_grads = jax.value_and_grad(loss_fn)(our_model)
    assert_close(our_loss, ref_loss, atol=1e-5, rtol=1e-5)
    _assert_grads_match(our_grads, ref_model, K, atol=2e-5, rtol=2e-4)


def test_forward_kld_grad_matches_reference():
    """core.py:87-102 gradient parity (the value oracle is above)."""
    K = 4
    ref_model, our_model, _ = _build_estimator_pair(K=K)
    x = RNG.normal(size=(32, 2)).astype(np.float32) * 1.5

    ref_loss = ref_model.forward_kld(torch.tensor(x))
    ref_model.zero_grad()
    ref_loss.backward()

    our_loss, our_grads = jax.value_and_grad(
        lambda m: m.forward_kld(jnp.asarray(x))
    )(our_model)
    assert_close(our_loss, ref_loss, atol=1e-5, rtol=1e-5)
    _assert_grads_match(our_grads, ref_model, K, atol=2e-5, rtol=2e-4)


# ---------------------------------------------------------------------------
# NSF wrapper stack (model-level oracle for the headline benchmark path)
#
# Reference: flows/neural_spline/wrapper.py:14-311, coupling.py:262-362,
# autoregressive.py:17-134.  Our param nets use a uniform 3K+1 spline-param
# layout per dim (coupling.py module docstring) vs the reference's ragged
# 3K-1 (linear) / 3K (circular) / 3K+1 (per-dim list) layouts, so copying a
# reference final layer scatters its outputs into the matching slots; slots
# our kernel never reads stay zero.
# ---------------------------------------------------------------------------

def copy_linear(our_lin, ref_lin):
    return our_lin.replace(weight=t2j(ref_lin.weight).T, bias=t2j(ref_lin.bias))


def copy_masked_linear(our_lin, ref_lin):
    """Copy weights AND mask (permute_mask draws differ between torch/np RNG)."""
    return our_lin.replace(
        weight=t2j(ref_lin.weight).T,
        bias=t2j(ref_lin.bias),
        mask=t2j(ref_lin.mask).T,
    )


def _final_slot_map(num_bins, tails_kind):
    """ref slot j -> our slot, per transformed dim (uniform 3K+1 layout)."""
    K = num_bins
    if tails_kind == "linear":
        m_ref, d_off = 3 * K - 1, 1   # ref ud = interior knots -> our slots 1..K-1
    elif tails_kind == "circular":
        m_ref, d_off = 3 * K, 0       # ref ud = K slots -> our slots 0..K-1
    else:  # per-dim list: layouts coincide
        m_ref, d_off = 3 * K + 1, 0
    return m_ref, [j if j < 2 * K else 2 * K + d_off + (j - 2 * K)
                   for j in range(m_ref)]


def expand_final_linear(our_final, ref_final, d_tr, num_bins, tails_kind,
                        masked=False):
    """Scatter a ragged reference final layer into our uniform-layout layer."""
    m_ours = 3 * num_bins + 1
    m_ref, smap = _final_slot_map(num_bins, tails_kind)
    rw = ref_final.weight.detach().numpy()  # (d_tr*m_ref, hidden)
    rb = ref_final.bias.detach().numpy()
    hidden = rw.shape[1]
    W = np.zeros((hidden, d_tr * m_ours), np.float32)
    B = np.zeros(d_tr * m_ours, np.float32)
    M = np.zeros((hidden, d_tr * m_ours), np.float32) if masked else None
    rm = ref_final.mask.detach().numpy() if masked else None
    for d in range(d_tr):
        for j, slot in enumerate(smap):
            W[:, d * m_ours + slot] = rw[d * m_ref + j]
            B[d * m_ours + slot] = rb[d * m_ref + j]
            if masked:
                M[:, d * m_ours + slot] = rm[d * m_ref + j]
    out = our_final.replace(weight=jnp.asarray(W), bias=jnp.asarray(B))
    if masked:
        out = out.replace(mask=jnp.asarray(M))
    return out


def copy_resnet(our_net, ref_net, d_tr, num_bins, tails_kind):
    """Map a reference nets.ResidualNet onto ours (resnet.py:53-104)."""
    blocks = tuple(
        ob.replace(
            linear_0=copy_linear(ob.linear_0, rb.linear_layers[0]),
            linear_1=copy_linear(ob.linear_1, rb.linear_layers[1]),
            context_layer=(
                copy_linear(ob.context_layer, rb.context_layer)
                if ob.context_layer is not None else None
            ),
        )
        for ob, rb in zip(our_net.blocks, ref_net.blocks)
    )
    our_net = our_net.replace(
        initial_layer=copy_linear(our_net.initial_layer, ref_net.initial_layer),
        blocks=blocks,
        final_layer=expand_final_linear(
            our_net.final_layer, ref_net.final_layer, d_tr, num_bins, tails_kind
        ),
    )
    if our_net.preprocessing is not None:
        our_net = our_net.replace(
            preprocessing=our_net.preprocessing.replace(
                weights=t2j(ref_net.preprocessing.weights)
            )
        )
    return our_net


def copy_made(our_made, ref_made, d_tr, num_bins, tails_kind):
    """Map a reference nets.MADE onto ours, incl. masks and periodic features."""
    blocks = tuple(
        ob.replace(
            linear_0=copy_masked_linear(ob.linear_0, rb.linear_layers[0]),
            linear_1=copy_masked_linear(ob.linear_1, rb.linear_layers[1]),
            context_layer=(
                copy_linear(ob.context_layer, rb.context_layer)
                if ob.context_layer is not None else None
            ),
        )
        for ob, rb in zip(our_made.blocks, ref_made.blocks)
    )
    our_made = our_made.replace(
        initial_layer=copy_masked_linear(our_made.initial_layer,
                                         ref_made.initial_layer),
        context_layer=(
            copy_linear(our_made.context_layer, ref_made.context_layer)
            if our_made.context_layer is not None else None
        ),
        blocks=blocks,
        final_layer=expand_final_linear(
            our_made.final_layer, ref_made.final_layer, d_tr, num_bins,
            tails_kind, masked=True,
        ),
    )
    if our_made.preprocessing is not None:
        our_made = our_made.replace(
            preprocessing=our_made.preprocessing.replace(
                weights=t2j(ref_made.preprocessing.weights)
            )
        )
    return our_made


def copy_cdf(our_cdf, ref_cdf, num_bins, tails_kind):
    """Map a reference PiecewiseRationalQuadraticCDF (coupling.py:170-259)."""
    ud_ref = ref_cdf.unnormalized_derivatives.detach().numpy()
    K = num_bins
    if tails_kind == "linear":
        ud = np.zeros((*ud_ref.shape[:-1], K + 1), np.float32)
        ud[..., 1:K] = ud_ref
    else:  # per-dim list: K+1 slots on both sides
        ud = ud_ref
    return our_cdf.replace(
        unnormalized_widths=t2j(ref_cdf.unnormalized_widths),
        unnormalized_heights=t2j(ref_cdf.unnormalized_heights),
        unnormalized_derivatives=jnp.asarray(ud),
    )


def _assert_flow_pair_matches(ours, ref, z, atol=2e-4, rtol=2e-4, context=None):
    tz = torch.tensor(z)
    tc = None if context is None else torch.tensor(context)
    jc = None if context is None else jnp.asarray(context)
    for direction in ("forward", "inverse"):
        zr, ldr = getattr(ref, direction)(tz, tc) if tc is not None else getattr(
            ref, direction)(tz)
        zo, ldo = getattr(ours, direction)(jnp.asarray(z), jc)
        assert_close(zo, zr, atol=atol, rtol=rtol, msg=f"{direction} outputs")
        assert_close(ldo, ldr, atol=atol, rtol=rtol, msg=f"{direction} log_det")


def test_coupled_rqs_wrapper_matches_reference():
    """CoupledRationalQuadraticSpline (wrapper.py:14-85), random weights."""
    D, K, hidden, blocks = 4, 8, 32, 2
    torch.manual_seed(0)
    ref = ref_nf.flows.CoupledRationalQuadraticSpline(
        D, blocks, hidden, num_bins=K, init_identity=False
    )
    ours = flows.CoupledRationalQuadraticSpline.create(
        jax.random.key(0), D, blocks, hidden, num_bins=K, init_identity=False
    )
    d_tr = len(np.asarray(ours.prqct.transform_features))
    ours = ours.replace(
        prqct=ours.prqct.replace(
            transform_net=copy_resnet(
                ours.prqct.transform_net, ref.prqct.transform_net, d_tr, K,
                "linear",
            ),
            unconditional_transform=copy_cdf(
                ours.prqct.unconditional_transform,
                ref.prqct.unconditional_transform, K, "linear",
            ),
        )
    )
    z = RNG.uniform(-4.0, 4.0, size=(17, D)).astype(np.float32)
    _assert_flow_pair_matches(ours, ref, z)


def test_circular_coupled_rqs_wrapper_matches_reference():
    """CircularCoupledRationalQuadraticSpline (wrapper.py:88-183), scalar bound.

    With a tensor bound the reference indexes the full-length bound vector
    with identity-split positions when computing the periodic-feature scale
    (wrapper.py:136-137), which mixes up dims unless they coincide; we index
    by actual feature id.  The tensor-bound case is oracle-tested below
    (test_circular_coupled_rqs_wrapper_tensor_bound_matches_reference) by
    reproducing the reference's quirky scale on our side, test-only.
    """
    D, K, hidden, blocks = 3, 6, 24, 2
    torch.manual_seed(1)
    ref = ref_nf.flows.CircularCoupledRationalQuadraticSpline(
        D, blocks, hidden, ind_circ=[1], num_bins=K, tail_bound=np.pi,
        init_identity=False,
    )
    ours = flows.CircularCoupledRationalQuadraticSpline.create(
        jax.random.key(0), D, blocks, hidden, ind_circ=[1], num_bins=K,
        tail_bound=np.pi, init_identity=False,
    )
    d_tr = len(np.asarray(ours.prqct.transform_features))
    ours = ours.replace(
        prqct=ours.prqct.replace(
            transform_net=copy_resnet(
                ours.prqct.transform_net, ref.prqct.transform_net, d_tr, K,
                "list",
            ),
            unconditional_transform=copy_cdf(
                ours.prqct.unconditional_transform,
                ref.prqct.unconditional_transform, K, "list",
            ),
        )
    )
    z = RNG.uniform(-3.0, 3.0, size=(13, D)).astype(np.float32)
    _assert_flow_pair_matches(ours, ref, z)


@pytest.mark.parametrize("with_context", [False, True])
def test_autoregressive_rqs_wrapper_matches_reference(with_context):
    """AutoregressiveRationalQuadraticSpline (wrapper.py:186-244)."""
    D, K, hidden, blocks = 4, 8, 32, 2
    ctx_ch = 3 if with_context else None
    torch.manual_seed(2)
    ref = ref_nf.flows.AutoregressiveRationalQuadraticSpline(
        D, blocks, hidden, num_context_channels=ctx_ch, num_bins=K,
        init_identity=False,
    )
    ours = flows.AutoregressiveRationalQuadraticSpline.create(
        jax.random.key(0), D, blocks, hidden, num_context_channels=ctx_ch,
        num_bins=K, init_identity=False,
    )
    ours = ours.replace(
        mprqat=ours.mprqat.replace(
            autoregressive_net=copy_made(
                ours.mprqat.autoregressive_net, ref.mprqat.autoregressive_net,
                D, K, "linear",
            )
        )
    )
    z = RNG.uniform(-4.0, 4.0, size=(9, D)).astype(np.float32)
    ctx = RNG.normal(size=(9, 3)).astype(np.float32) if with_context else None
    _assert_flow_pair_matches(ours, ref, z, context=ctx)


def test_circular_autoregressive_rqs_wrapper_matches_reference():
    """CircularAutoregressiveRationalQuadraticSpline — the flagship layer
    (wrapper.py:247-311) with the cylinder config: tensor tail_bound [5, pi],
    permute_mask=True (masks copied; torch/np permutation draws differ)."""
    D, K, hidden, blocks = 2, 10, 64, 1
    torch.manual_seed(3)
    ref = ref_nf.flows.CircularAutoregressiveRationalQuadraticSpline(
        D, blocks, hidden, ind_circ=[1], num_bins=K,
        tail_bound=torch.tensor([5.0, np.pi]), permute_mask=True,
        init_identity=False,
    )
    ours = flows.CircularAutoregressiveRationalQuadraticSpline.create(
        jax.random.key(0), D, blocks, hidden, ind_circ=[1], num_bins=K,
        tail_bound=jnp.array([5.0, np.pi]), permute_mask=True,
        init_identity=False,
    )
    ours = ours.replace(
        mprqat=ours.mprqat.replace(
            autoregressive_net=copy_made(
                ours.mprqat.autoregressive_net, ref.mprqat.autoregressive_net,
                D, K, "list",
            )
        )
    )
    z = np.stack(
        [RNG.uniform(-4.5, 4.5, size=11), RNG.uniform(-3.0, 3.0, size=11)],
        axis=1,
    ).astype(np.float32)
    _assert_flow_pair_matches(ours, ref, z)


def test_flagship_model_log_prob_matches_reference():
    """Model-level oracle for the headline benchmark path: a K-layer circular
    AR-NSF flow on the cylinder base (paper_example_nsf.ipynb config, reduced)
    — weight-copied end to end, log_prob compared on random cylinder points."""
    D, K_layers, K_bins, hidden = 2, 3, 10, 32
    base_ref = ref_nf.distributions.UniformGaussian(
        2, torch.tensor([1]), torch.tensor([1.0, 2 * np.pi])
    )
    base_ours = distributions.UniformGaussian.create(
        2, [1], jnp.array([1.0, 2 * np.pi])
    )
    ref_layers, our_layers = [], []
    for i in range(K_layers):
        torch.manual_seed(10 + i)
        rf = ref_nf.flows.CircularAutoregressiveRationalQuadraticSpline(
            D, 1, hidden, ind_circ=[1], num_bins=K_bins,
            tail_bound=torch.tensor([5.0, np.pi]), permute_mask=True,
            init_identity=False,
        )
        of = flows.CircularAutoregressiveRationalQuadraticSpline.create(
            jax.random.key(i), D, 1, hidden, ind_circ=[1], num_bins=K_bins,
            tail_bound=jnp.array([5.0, np.pi]), permute_mask=True,
            init_identity=False, rng_seed=i,
        )
        of = of.replace(
            mprqat=of.mprqat.replace(
                autoregressive_net=copy_made(
                    of.mprqat.autoregressive_net, rf.mprqat.autoregressive_net,
                    D, K_bins, "list",
                )
            )
        )
        ref_layers.append(rf)
        our_layers.append(of)
    ref_model = ref_nf.NormalizingFlow(base_ref, ref_layers)
    our_model = nf.NormalizingFlow.create(base_ours, our_layers)
    x = np.stack(
        [RNG.normal(size=33), RNG.uniform(-np.pi, np.pi, size=33)], axis=1
    ).astype(np.float32)
    assert_close(
        our_model.log_prob(jnp.asarray(x)),
        ref_model.log_prob(torch.tensor(x)),
        atol=5e-4, rtol=5e-4,
    )
    assert_close(
        float(our_model.forward_kld(jnp.asarray(x))),
        float(ref_model.forward_kld(torch.tensor(x)).detach()),
        atol=5e-4, rtol=5e-4,
    )


# ---------------------------------------------------------------------------
# Glow stack: weight-copied GlowBlock and 2-level MultiscaleFlow oracle
# (reference flows/affine/glow.py:11-84, core.py:455-616)
# ---------------------------------------------------------------------------

def copy_convnet(our_cnn, ref_cnn):
    """Map reference nets.ConvNet2d (torch Sequential) onto ours; OIHW both."""
    ref_convs = [m for m in ref_cnn.net if isinstance(m, torch.nn.Conv2d)]
    convs = tuple(
        oc.replace(weight=t2j(rc.weight),
                   bias=None if rc.bias is None else t2j(rc.bias))
        for oc, rc in zip(our_cnn.convs, ref_convs)
    )
    return our_cnn.replace(convs=convs)


def _randomize_ref_glow_block(ref, gen):
    """Give a reference GlowBlock non-trivial weights: random convs (incl. the
    zero-init output conv), random 1x1-conv LU params, and ActNorm marked
    initialized with random s,t (so the lazy first-batch init never fires)."""
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight.normal_(0.0, 0.1, generator=gen)
                if m.bias is not None:
                    m.bias.normal_(0.0, 0.1, generator=gen)
        for f in ref.flows:
            if isinstance(f, ref_nf.flows.ActNorm):
                f.s.normal_(0.0, 0.2, generator=gen)
                f.t.normal_(0.0, 0.2, generator=gen)
                f.data_dep_init_done.fill_(1.0)


def copy_glow_block(ours, ref):
    """Weight-copy a reference GlowBlock (coupling + 1x1 conv + ActNorm)."""
    new_flows = []
    for of, rf in zip(ours.flows, ref.flows):
        if isinstance(rf, ref_nf.flows.AffineCouplingBlock):
            coupling = of.coupling.replace(
                param_map=copy_convnet(
                    of.coupling.param_map, rf.flows[1].param_map
                )
            )
            new_flows.append(of.replace(coupling=coupling))
        elif isinstance(rf, ref_nf.flows.Invertible1x1Conv):
            new_flows.append(
                of.replace(P=t2j(rf.P), L=t2j(rf.L), U=t2j(rf.U),
                           sign_S=t2j(rf.sign_S), log_S=t2j(rf.log_S))
            )
        elif isinstance(rf, ref_nf.flows.ActNorm):
            new_flows.append(
                of.replace(s=t2j(rf.s), t=t2j(rf.t),
                           initialized=jnp.ones((), jnp.bool_))
            )
        else:
            raise AssertionError(f"unexpected reference layer {type(rf)}")
    return ours.replace(flows=tuple(new_flows))


@pytest.mark.parametrize("channels,split_mode", [(4, "channel"), (3, "channel")])
def test_glow_block_matches_reference(channels, split_mode):
    torch.manual_seed(4)
    gen = torch.Generator().manual_seed(4)
    ref = ref_nf.flows.GlowBlock(channels, 16, split_mode=split_mode)
    _randomize_ref_glow_block(ref, gen)
    ours = flows.GlowBlock.create(jax.random.key(0), channels, 16,
                                  split_mode=split_mode)
    ours = copy_glow_block(ours, ref)
    z = RNG.normal(size=(2, channels, 4, 4)).astype(np.float32)
    for direction in ("forward", "inverse"):
        zr, ldr = getattr(ref, direction)(torch.tensor(z))
        zo, ldo = getattr(ours, direction)(jnp.asarray(z))
        assert_close(zo, zr, atol=2e-4, rtol=2e-4, msg=f"{direction} outputs")
        assert_close(ldo, ldr, atol=2e-4, rtol=2e-4, msg=f"{direction} log_det")


def _build_glow_pair(L=2, K=2, channels=3, hw=8, hidden=16, num_classes=4):
    """Mirrored reference/our multiscale Glow models (glow.ipynb config,
    reduced), weight-copied, with randomized (non-trivial) parameters."""
    gen = torch.Generator().manual_seed(7)
    input_shape = (channels, hw, hw)
    ref_q0, ref_flows, ref_merges = [], [], []
    our_q0, our_flows, our_merges = [], [], []
    for i in range(L):
        rfs, ofs = [], []
        for j in range(K):
            ch = channels * 2 ** (L + 1 - i)
            rb = ref_nf.flows.GlowBlock(ch, hidden)
            _randomize_ref_glow_block(rb, gen)
            ob = copy_glow_block(
                flows.GlowBlock.create(jax.random.key(i * K + j), ch, hidden), rb
            )
            rfs.append(rb)
            ofs.append(ob)
        rfs.append(ref_nf.flows.Squeeze())
        ofs.append(flows.Squeeze())
        ref_flows.append(rfs)
        our_flows.append(ofs)
        if i > 0:
            ref_merges.append(ref_nf.flows.Merge())
            our_merges.append(flows.Merge())
            latent_shape = (
                input_shape[0] * 2 ** (L - i),
                input_shape[1] // 2 ** (L - i),
                input_shape[2] // 2 ** (L - i),
            )
        else:
            latent_shape = (
                input_shape[0] * 2 ** (L + 1),
                input_shape[1] // 2 ** L,
                input_shape[2] // 2 ** L,
            )
        rq = ref_nf.distributions.ClassCondDiagGaussian(latent_shape, num_classes)
        with torch.no_grad():
            rq.loc.normal_(0.0, 0.3, generator=gen)
            rq.log_scale.normal_(0.0, 0.2, generator=gen)
        oq = distributions.ClassCondDiagGaussian.create(
            latent_shape, num_classes
        ).replace(loc=t2j(rq.loc), log_scale=t2j(rq.log_scale))
        ref_q0.append(rq)
        our_q0.append(oq)
    ref_model = ref_nf.MultiscaleFlow(ref_q0, ref_flows, ref_merges)
    our_model = nf.MultiscaleFlow.create(our_q0, our_flows, our_merges)
    return ref_model, our_model, input_shape


def test_multiscale_glow_log_prob_matches_reference():
    """2-level Glow MultiscaleFlow.log_prob + forward_kld oracle (core.py:588-616)."""
    ref_model, our_model, input_shape = _build_glow_pair()
    B = 5
    x = RNG.normal(size=(B, *input_shape)).astype(np.float32)
    y = RNG.integers(0, 4, size=B)
    lp_ref = ref_model.log_prob(torch.tensor(x), torch.tensor(y))
    lp_our = our_model.log_prob(jnp.asarray(x), jnp.asarray(y))
    assert_close(lp_our, lp_ref, atol=5e-3, rtol=5e-4)
    kld_ref = float(ref_model.forward_kld(torch.tensor(x), torch.tensor(y)))
    kld_our = float(our_model.forward_kld(jnp.asarray(x), jnp.asarray(y)))
    assert_close(kld_our, kld_ref, atol=5e-4, rtol=5e-4)


def test_multiscale_glow_latent_roundtrip_matches_reference():
    """inverse_and_log_det -> forward_and_log_det parity on the latent list
    (core.py:504-551)."""
    ref_model, our_model, input_shape = _build_glow_pair()
    B = 3
    x = RNG.normal(size=(B, *input_shape)).astype(np.float32)
    z_ref, ld_ref = ref_model.inverse_and_log_det(torch.tensor(x))
    z_our, ld_our = our_model.inverse_and_log_det(jnp.asarray(x))
    assert len(z_ref) == len(z_our)
    for zr, zo in zip(z_ref, z_our):
        assert_close(zo, zr, atol=2e-4, rtol=2e-4)
    assert_close(ld_our, ld_ref, atol=5e-3, rtol=5e-4)
    x_ref, fld_ref = ref_model.forward_and_log_det([torch.tensor(np.asarray(z)) for z in z_our])
    x_our, fld_our = our_model.forward_and_log_det(list(z_our))
    assert_close(x_our, x_ref, atol=2e-4, rtol=2e-4)
    assert_close(x_our, x, atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# Long-tail oracle parity: MAF, LU linears, CCAffineConst, BatchNorm, VAE
# encoders/decoders, AffineGaussian, GaussianPCA, ClassCondDiagGaussian.
# Reference files cited per test.
# ---------------------------------------------------------------------------

def copy_made_plain(our_made, ref_made):
    """Map a reference nets.MADE onto ours for layouts that coincide (e.g.
    output_multiplier=2 for MAF): every MaskedLinear copied verbatim
    (weights, biases AND masks — the degree draws differ between torch and
    numpy RNGs, so masks must travel too)."""
    blocks = tuple(
        ob.replace(
            linear_0=copy_masked_linear(ob.linear_0, rb.linear_layers[0]),
            linear_1=copy_masked_linear(ob.linear_1, rb.linear_layers[1]),
            context_layer=(
                copy_linear(ob.context_layer, rb.context_layer)
                if ob.context_layer is not None else None
            ),
        )
        for ob, rb in zip(our_made.blocks, ref_made.blocks)
    )
    return our_made.replace(
        initial_layer=copy_masked_linear(our_made.initial_layer,
                                         ref_made.initial_layer),
        context_layer=(
            copy_linear(our_made.context_layer, ref_made.context_layer)
            if our_made.context_layer is not None else None
        ),
        blocks=blocks,
        final_layer=copy_masked_linear(our_made.final_layer,
                                       ref_made.final_layer),
    )


@pytest.mark.parametrize("with_context", [False, True])
def test_maf_matches_reference(with_context):
    """MaskedAffineAutoregressive (affine/autoregressive.py:50-128): the MAF
    layer with its sigmoid(s+2)+1e-3 scale map, both directions (the inverse
    runs D sequential MADE passes)."""
    D, H, C = 4, 16, 3
    torch.manual_seed(7)
    ref = ref_nf.flows.MaskedAffineAutoregressive(
        D, H, context_features=C if with_context else None, num_blocks=2
    )
    # randomize: default init leaves the final layer near zero
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.3 * torch.randn_like(p))
    ours = flows.MaskedAffineAutoregressive.create(
        jax.random.key(0), D, H,
        context_features=C if with_context else None, num_blocks=2,
    )
    ours = ours.replace(
        autoregressive_net=copy_made_plain(
            ours.autoregressive_net, ref.autoregressive_net
        )
    )
    z = RNG.normal(size=(8, D)).astype(np.float32)
    ctx = RNG.normal(size=(8, C)).astype(np.float32) if with_context else None
    _assert_flow_pair_matches(ours, ref, z, atol=1e-5, rtol=1e-5, context=ctx)


def _copy_lulinear(our_lin, ref_lin):
    return our_lin.replace(
        lower_entries=t2j(ref_lin.lower_entries),
        upper_entries=t2j(ref_lin.upper_entries),
        unconstrained_upper_diag=t2j(ref_lin.unconstrained_upper_diag),
        bias=t2j(ref_lin.bias),
    )


def test_lulinear_matches_reference():
    """_LULinear (mixing.py:368-532): L/U entry layout (np.tril/triu_indices),
    softplus diagonal, triangular-solve inverse."""
    D = 5
    torch.manual_seed(11)
    ref = ref_nf.flows.mixing._LULinear(D, identity_init=False)
    with torch.no_grad():
        ref.bias.add_(torch.randn(D) * 0.5)
    ours = _copy_lulinear(
        flows.mixing._LULinear.create(D, identity_init=False), ref
    )
    z = RNG.normal(size=(8, D)).astype(np.float32)
    _assert_flow_pair_matches(ours, ref, z, atol=1e-5, rtol=1e-5)


def test_lulinear_permute_matches_reference():
    """LULinearPermute (mixing.py:535-563): fixed random permutation composed
    with the LU linear, forward = linear.inverse o permutation.inverse."""
    D = 6
    torch.manual_seed(13)
    ref = ref_nf.flows.LULinearPermute(D, identity_init=False)
    ours = flows.LULinearPermute.create(D, identity_init=False)
    ours = ours.replace(
        permutation=ours.permutation.replace(
            permutation=t2j(ref.permutation._permutation)
        ),
        linear=_copy_lulinear(ours.linear, ref.linear),
    )
    z = RNG.normal(size=(8, D)).astype(np.float32)
    _assert_flow_pair_matches(ours, ref, z, atol=1e-5, rtol=1e-5)


def test_cc_affine_const_matches_reference():
    """CCAffineConst (coupling.py:57-96): class-conditional affine const with
    one-hot-matmul per-class offsets."""
    D, C = 4, 3
    torch.manual_seed(17)
    ref = ref_nf.flows.CCAffineConst((D,), C)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.3 * torch.randn_like(p))
    ours = flows.CCAffineConst.create((D,), C).replace(
        s=t2j(ref.s), t=t2j(ref.t), s_cc=t2j(ref.s_cc), t_cc=t2j(ref.t_cc)
    )
    y = np.eye(C, dtype=np.float32)[RNG.integers(0, C, size=8)]
    z = RNG.normal(size=(8, D)).astype(np.float32)
    _assert_flow_pair_matches(ours, ref, z, atol=1e-5, rtol=1e-5, context=y)


def test_batchnorm_matches_reference():
    """BatchNorm (normalization.py:42-62): batch-stat whitening with unbiased
    std and gradient-stopped statistics, forward only."""
    ref = ref_nf.flows.BatchNorm()
    ours = flows.BatchNorm()
    z = RNG.normal(size=(16, 4)).astype(np.float32) * 2.0 + 1.0
    zr, ldr = ref(torch.tensor(z))
    zo, ldo = ours.forward(jnp.asarray(z))
    assert_close(zo, zr, atol=1e-5, rtol=1e-5)
    assert_close(ldo, ldr, atol=1e-5, rtol=1e-5)


def test_class_cond_diag_gaussian_matches_reference():
    """ClassCondDiagGaussian (base.py:273-344): per-class loc/scale via
    one-hot matmul, incl. temperature annealing."""
    shape, C = (3,), 5
    torch.manual_seed(19)
    ref = ref_nf.distributions.ClassCondDiagGaussian(shape, C)
    with torch.no_grad():
        ref.loc.add_(torch.randn_like(ref.loc))
        ref.log_scale.add_(0.3 * torch.randn_like(ref.log_scale))
    ours = distributions.ClassCondDiagGaussian.create(shape, C).replace(
        loc=t2j(ref.loc), log_scale=t2j(ref.log_scale)
    )
    y = RNG.integers(0, C, size=8)
    z = RNG.normal(size=(8, *shape)).astype(np.float32)
    assert_close(
        ours.log_prob(jnp.asarray(z), jnp.asarray(y)),
        ref.log_prob(torch.tensor(z), torch.tensor(y)),
        atol=1e-5, rtol=1e-5,
    )
    # temperature-annealed branch (base.py:319-320)
    ref.temperature = 0.6
    ours_t = ours.replace(temperature=0.6)
    assert_close(
        ours_t.log_prob(jnp.asarray(z), jnp.asarray(y)),
        ref.log_prob(torch.tensor(z), torch.tensor(y)),
        atol=1e-5, rtol=1e-5,
    )


@pytest.mark.parametrize("class_cond", [False, True])
def test_affine_gaussian_matches_reference(class_cond):
    """AffineGaussian (base.py:474-570): N(0,I) pushed through an
    (CC)AffineConst transform, class-conditional and not."""
    shape, C = (4,), 3
    torch.manual_seed(23)
    ref = ref_nf.distributions.AffineGaussian(
        shape, shape, num_classes=C if class_cond else None
    )
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.3 * torch.randn_like(p))
    ours = distributions.AffineGaussian.create(
        shape, shape, num_classes=C if class_cond else None
    )
    if class_cond:
        ours = ours.replace(transform=ours.transform.replace(
            s=t2j(ref.transform.s), t=t2j(ref.transform.t),
            s_cc=t2j(ref.transform.s_cc), t_cc=t2j(ref.transform.t_cc),
        ))
    else:
        ours = ours.replace(transform=ours.transform.replace(
            s=t2j(ref.transform.s), t=t2j(ref.transform.t),
        ))
    z = RNG.normal(size=(8, *shape)).astype(np.float32)
    y = RNG.integers(0, C, size=8) if class_cond else None
    ref_lp = (ref.log_prob(torch.tensor(z), torch.tensor(y)) if class_cond
              else ref.log_prob(torch.tensor(z)))
    our_lp = ours.log_prob(
        jnp.asarray(z), jnp.asarray(y) if class_cond else None
    )
    assert_close(our_lp, ref_lp, atol=1e-5, rtol=1e-5)


def test_gaussian_pca_matches_reference_modulo_documented_bugs():
    """GaussianPCA (base.py:662-719).  The reference normalizer has two bugs
    we deliberately do NOT reproduce (see distributions/base.py GaussianPCA
    docstring): it ADDS d/2*log(2pi) (sign flipped) and subtracts
    0.5*det(Sig) where the Gaussian density needs 0.5*logdet(Sig).  The
    quadratic form and Sigma itself are identical, so the two log-probs must
    differ by EXACTLY the constant d*log(2pi)/1 correction terms:
        ours = ref - d*log(2pi) + 0.5*det(Sig) - 0.5*logdet(Sig).
    """
    D, L = 4, 2
    torch.manual_seed(29)
    ref = ref_nf.distributions.GaussianPCA(D, latent_dim=L, sigma=0.3)
    ours = distributions.GaussianPCA.create(D, latent_dim=L, sigma=0.3).replace(
        loc=t2j(ref.loc), W=t2j(ref.W), log_sigma=t2j(ref.log_sigma)
    )
    z = RNG.normal(size=(8, D)).astype(np.float32)
    ref_lp = ref.log_prob(torch.tensor(z)).detach().numpy()
    Sig = (ref.W.T @ ref.W + torch.exp(2 * ref.log_sigma) * torch.eye(D))
    det = float(torch.det(Sig))
    logdet = float(torch.logdet(Sig))
    expected = ref_lp - D * np.log(2 * np.pi) + 0.5 * det - 0.5 * logdet
    assert_close(ours.log_prob(jnp.asarray(z)), expected, atol=1e-5, rtol=1e-5)


def test_nn_diag_gaussian_encoder_matches_reference():
    """NNDiagGaussian encoder (encoder.py:129-188): mean/log-var split from
    the net output, (batch, samples, d) shape convention."""
    Dx, Dz = 4, 3
    torch.manual_seed(31)
    ref_net = ref_nf.nets.MLP([Dx, 16, 2 * Dz])
    ref = ref_nf.distributions.NNDiagGaussian(ref_net)
    ours = distributions.NNDiagGaussian(net=copy_mlp(ref_net))
    x = RNG.normal(size=(5, Dx)).astype(np.float32)
    z = RNG.normal(size=(5, 2, Dz)).astype(np.float32)
    assert_close(
        ours.log_prob(jnp.asarray(z), jnp.asarray(x)),
        ref.log_prob(torch.tensor(z), torch.tensor(x)),
        atol=1e-5, rtol=1e-5,
    )


def test_nn_diag_gaussian_decoder_matches_reference():
    """NNDiagGaussianDecoder (decoder.py:32-70).  Equal-dims case is exact;
    when latent dim != data dim the reference normalizer uses prod(z.shape)
    where the density over x requires prod(x.shape) (decoder.py:91-93) — we
    implement the correct form, so the difference is exactly
    0.5*(d_x - d_z)*log(2pi)."""
    torch.manual_seed(37)
    # equal dims: exact parity
    ref_net = ref_nf.nets.MLP([3, 16, 6])
    ref = ref_nf.distributions.NNDiagGaussianDecoder(ref_net)
    ours = distributions.NNDiagGaussianDecoder(net=copy_mlp(ref_net))
    z = RNG.normal(size=(6, 3)).astype(np.float32)
    x = RNG.normal(size=(6, 3)).astype(np.float32)
    assert_close(
        ours.log_prob(jnp.asarray(x), jnp.asarray(z)),
        ref.log_prob(torch.tensor(x), torch.tensor(z)),
        atol=1e-5, rtol=1e-5,
    )
    # unequal dims: documented-correction parity
    ref_net2 = ref_nf.nets.MLP([2, 16, 8])
    ref2 = ref_nf.distributions.NNDiagGaussianDecoder(ref_net2)
    ours2 = distributions.NNDiagGaussianDecoder(net=copy_mlp(ref_net2))
    z2 = RNG.normal(size=(6, 2)).astype(np.float32)
    x2 = RNG.normal(size=(6, 4)).astype(np.float32)
    ref_lp = ref2.log_prob(torch.tensor(x2), torch.tensor(z2)).detach().numpy()
    expected = ref_lp - 0.5 * (4 - 2) * np.log(2 * np.pi)
    assert_close(ours2.log_prob(jnp.asarray(x2), jnp.asarray(z2)), expected,
                 atol=1e-5, rtol=1e-5)


def test_nn_bernoulli_decoder_matches_reference():
    """NNBernoulliDecoder (decoder.py:73-102) with the numerically-stable
    log-sigmoid form, incl. the z-batch > x-batch tiling path."""
    torch.manual_seed(41)
    ref_net = ref_nf.nets.MLP([3, 16, 4])
    ref = ref_nf.distributions.NNBernoulliDecoder(ref_net)
    ours = distributions.NNBernoulliDecoder(net=copy_mlp(ref_net))
    z = RNG.normal(size=(12, 3)).astype(np.float32)  # 2 samples per x
    x = (RNG.uniform(size=(6, 4)) > 0.5).astype(np.float32)
    assert_close(
        ours.log_prob(jnp.asarray(x), jnp.asarray(z)),
        ref.log_prob(torch.tensor(x), torch.tensor(z)),
        atol=1e-5, rtol=1e-5,
    )


def test_circular_coupled_rqs_wrapper_tensor_bound_matches_reference():
    """CircularCoupledRationalQuadraticSpline with a TENSOR tail_bound
    (wrapper.py:88-183).  The reference computes the periodic-feature scale
    as pi / tail_bound[ind_circ_id] (wrapper.py:136-137) — indexing the
    full-length bound vector with positions *within the identity subset*,
    which grabs the wrong dim's bound whenever the circular coordinate isn't
    at the same position in both (we index by actual feature id,
    neural_spline/wrapper.py:122).  For this oracle the reference's quirky
    scale is reproduced on our side BY OVERRIDING the preprocessing scale
    buffer (test-only), so everything else — tensor-bound coupling spline,
    circular-CDF unconditional transform, slot-mapped param nets — is
    compared exactly."""
    D, K, hidden, blocks = 3, 6, 24, 2
    tb_np = np.array([4.0, np.pi, 3.0], np.float32)
    torch.manual_seed(3)
    ref = ref_nf.flows.CircularCoupledRationalQuadraticSpline(
        D, blocks, hidden, ind_circ=[1], num_bins=K,
        tail_bound=torch.tensor(tb_np), reverse_mask=True,
        init_identity=False,
    )
    ours = flows.CircularCoupledRationalQuadraticSpline.create(
        jax.random.key(0), D, blocks, hidden, ind_circ=[1], num_bins=K,
        tail_bound=jnp.asarray(tb_np), reverse_mask=True,
        init_identity=False,
    )
    d_tr = len(np.asarray(ours.prqct.transform_features))
    net = copy_resnet(
        ours.prqct.transform_net, ref.prqct.transform_net, d_tr, K, "list")
    # identity half holds the circular dim here, so the quirk fires:
    # ref scale = pi/tail_bound[0] = pi/4 (correct would be pi/pi = 1)
    ref_pf_scale = ref.prqct.transform_net.preprocessing.scale
    assert_close(t2j(ref_pf_scale), np.pi / tb_np[0])  # quirk actually fires
    net = net.replace(
        preprocessing=net.preprocessing.replace(scale=t2j(ref_pf_scale)))
    ours = ours.replace(
        prqct=ours.prqct.replace(
            transform_net=net,
            unconditional_transform=copy_cdf(
                ours.prqct.unconditional_transform,
                ref.prqct.unconditional_transform, K, "list",
            ),
        )
    )
    z = RNG.uniform(-2.5, 2.5, size=(13, D)).astype(np.float32)
    _assert_flow_pair_matches(ours, ref, z)


# ---------------------------------------------------------------------------
# Conditional facade estimators (core.py:216-366): context threaded through
# the base encoder, every flow layer, the STL re-pass, and the target.
# ---------------------------------------------------------------------------

class _FixedEpsCondDiagGaussian(distributions.ConditionalDiagGaussian):
    eps: jnp.ndarray = None

    def sample_and_log_prob(self, key, num_samples: int = 1, context=None):
        mean, log_scale = self._params(context)
        eps = self.eps[:num_samples]
        z = mean + jnp.exp(log_scale) * eps
        log_p = -0.5 * self.d * np.log(2 * np.pi) - jnp.sum(
            log_scale + 0.5 * eps**2, axis=tuple(range(1, eps.ndim))
        )
        return z, log_p


@pytest.mark.parametrize("score_fn", [True, False])
def test_conditional_reverse_kld_matches_reference(score_fn):
    """ConditionalNormalizingFlow.reverse_kld (core.py:338-366) with a
    context-encoded base (base.py:104-155), context-aware AR-NSF layers,
    and a context-conditional target (target.py:198-224); identical
    injected eps on both sides.  Values oracle-checked for the plain and
    sticking-the-landing estimators; encoder gradients (plain-MLP mapping)
    oracle-checked too."""
    D, C, N, K, bins = 2, 4, 16, 2, 5
    torch.manual_seed(43)
    eps = RNG.normal(size=(N, D)).astype(np.float32)

    # context = concat(mean, std) consumed by both the encoder and target
    ctx = np.concatenate(
        [RNG.normal(size=(N, D)), RNG.uniform(0.5, 1.5, size=(N, D))],
        axis=1,
    ).astype(np.float32)

    ref_enc = ref_nf.nets.MLP([C, 16, 2 * D])

    class RefFixedEpsCond(ref_nf.distributions.base.ConditionalDiagGaussian):
        def forward(self, num_samples=1, context=None):
            out = self.context_encoder(context)
            split = out.shape[-1] // 2
            mean, log_scale = out[..., :split], out[..., split:]
            e = torch.tensor(eps)[:num_samples]
            z = mean + torch.exp(log_scale) * e
            log_p = -0.5 * self.d * np.log(2 * np.pi) - torch.sum(
                log_scale + 0.5 * e**2, list(range(1, self.n_dim + 1))
            )
            return z, log_p

    ref_flows, our_flows = [], []
    for i in range(K):
        rf = ref_nf.flows.AutoregressiveRationalQuadraticSpline(
            D, 2, 24, num_context_channels=C, num_bins=bins,
            init_identity=False)
        of = flows.AutoregressiveRationalQuadraticSpline.create(
            jax.random.key(i), D, 2, 24, num_context_channels=C,
            num_bins=bins, init_identity=False)
        of = of.replace(
            mprqat=of.mprqat.replace(
                autoregressive_net=copy_made(
                    of.mprqat.autoregressive_net, rf.mprqat.autoregressive_net,
                    D, bins, "linear",
                )
            )
        )
        ref_flows.append(rf)
        our_flows.append(of)

    ref_model = ref_nf.ConditionalNormalizingFlow(
        RefFixedEpsCond((D,), ref_enc), ref_flows,
        p=ref_nf.distributions.target.ConditionalDiagGaussian(),
    )
    our_base = _FixedEpsCondDiagGaussian(
        context_encoder=copy_mlp(ref_enc), shape=(D,), eps=jnp.asarray(eps)
    )
    our_model = nf.ConditionalNormalizingFlow.create(
        our_base, our_flows, p=distributions.ConditionalDiagGaussianTarget()
    )

    ref_loss = ref_model.reverse_kld(
        N, context=torch.tensor(ctx), beta=0.8, score_fn=score_fn)
    ref_model.zero_grad()
    ref_loss.backward()

    diff, rest = nf.partition(our_model)  # MADE masks/degrees are int buffers

    def loss_fn(d):
        return nf.combine(d, rest).reverse_kld(
            jax.random.key(0), N, context=jnp.asarray(ctx), beta=0.8,
            score_fn=score_fn)

    our_loss, our_grads = jax.value_and_grad(loss_fn)(diff)
    assert_close(our_loss, ref_loss, atol=2e-5, rtol=2e-5)
    # encoder grads (plain MLP -> exact leaf mapping)
    ref_linears = [m for m in ref_enc.net if isinstance(m, torch.nn.Linear)]
    for j, (our_lin, ref_lin) in enumerate(
        zip(our_grads.q0.context_encoder.linears, ref_linears)
    ):
        assert_close(our_lin.weight, ref_lin.weight.grad.T, atol=2e-5,
                     rtol=2e-4, msg=f"encoder linear {j} weight grad")
        assert_close(our_lin.bias, ref_lin.bias.grad, atol=2e-5, rtol=2e-4,
                     msg=f"encoder linear {j} bias grad")


def test_conv_residual_net_matches_reference():
    """ConvResidualNet (resnet.py:156-209): 1x1 in/out convs, 3x3 residual
    blocks with GLU context gating — the param net for image-NSF couplings.
    Weight-copied output oracle, with and without context."""

    def copy_conv(our_conv, ref_conv):
        return our_conv.replace(
            weight=t2j(ref_conv.weight), bias=t2j(ref_conv.bias))

    C_in, C_out, H, hidden, ctx_ch = 3, 6, 6, 8, 2
    torch.manual_seed(53)
    for with_ctx in (False, True):
        cc = ctx_ch if with_ctx else None
        ref = ref_nf.nets.ConvResidualNet(
            in_channels=C_in, out_channels=C_out, hidden_channels=hidden,
            context_channels=cc, num_blocks=2)
        with torch.no_grad():
            for p in ref.parameters():
                p.add_(0.1 * torch.randn_like(p))
        ours = nf.nets.ConvResidualNet.create(
            jax.random.key(0), C_in, C_out, hidden, context_channels=cc,
            num_blocks=2)
        ours = ours.replace(
            initial_layer=copy_conv(ours.initial_layer, ref.initial_layer),
            final_layer=copy_conv(ours.final_layer, ref.final_layer),
            blocks=tuple(
                ob.replace(
                    conv_0=copy_conv(ob.conv_0, rb.conv_layers[0]),
                    conv_1=copy_conv(ob.conv_1, rb.conv_layers[1]),
                    context_layer=(
                        copy_conv(ob.context_layer, rb.context_layer)
                        if with_ctx else None),
                )
                for ob, rb in zip(ours.blocks, ref.blocks)
            ),
        )
        x = RNG.normal(size=(4, C_in, H, H)).astype(np.float32)
        ctx = (RNG.normal(size=(4, ctx_ch, H, H)).astype(np.float32)
               if with_ctx else None)
        ref_out = (ref(torch.tensor(x), torch.tensor(ctx)) if with_ctx
                   else ref(torch.tensor(x)))
        our_out = ours(jnp.asarray(x), jnp.asarray(ctx) if with_ctx else None)
        assert_close(our_out, ref_out, atol=1e-5, rtol=1e-4,
                     msg=f"with_ctx={with_ctx}")


def test_conv_coupled_rqs_4d_matches_reference():
    """PiecewiseRationalQuadraticCoupling on NCHW images with a
    ConvResidualNet param map (coupling.py:71-77, 150-160 image path +
    hidden_channels sqrt-rescale coupling.py:334-343).  The reference's
    ragged per-channel 3K-1 (linear-tails) final-conv layout is scattered
    into our uniform 3K+1 slots."""

    def copy_conv(our_conv, ref_conv):
        return our_conv.replace(
            weight=t2j(ref_conv.weight), bias=t2j(ref_conv.bias))

    def expand_final_conv(our_final, ref_final, d_tr, num_bins):
        m_ours = 3 * num_bins + 1
        m_ref, smap = _final_slot_map(num_bins, "linear")
        rw = ref_final.weight.detach().numpy()  # (d_tr*m_ref, hidden, 1, 1)
        rb = ref_final.bias.detach().numpy()
        hidden = rw.shape[1]
        W = np.zeros((d_tr * m_ours, hidden, 1, 1), np.float32)
        B = np.zeros(d_tr * m_ours, np.float32)
        for d in range(d_tr):
            for j, slot in enumerate(smap):
                W[d * m_ours + slot] = rw[d * m_ref + j]
                B[d * m_ours + slot] = rb[d * m_ref + j]
        return our_final.replace(weight=jnp.asarray(W), bias=jnp.asarray(B))

    C, hw, hidden, K = 4, 6, 8, 4
    mask = np.array([1, 0, 1, 0])
    d_tr = int((np.asarray(mask) > 0).sum())
    torch.manual_seed(59)

    def ref_net_fn(in_ch, out_ch):
        return ref_nf.nets.ConvResidualNet(
            in_channels=in_ch, out_channels=out_ch, hidden_channels=hidden,
            num_blocks=2)

    ref = ref_nf.flows.neural_spline.coupling.PiecewiseRationalQuadraticCoupling(
        mask=torch.tensor(mask), transform_net_create_fn=ref_net_fn,
        num_bins=K, tails="linear", tail_bound=3.0)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.1 * torch.randn_like(p))

    from normflows_tpu.nets import ConvResidualNet

    def net_fn(in_ch, out_ch):
        return ConvResidualNet.create(jax.random.key(0), in_ch, out_ch,
                                      hidden_channels=hidden, num_blocks=2)

    ours = flows.PiecewiseRationalQuadraticCoupling.create(
        mask=mask, transform_net_create_fn=net_fn, num_bins=K,
        tails="linear", tail_bound=3.0)
    net = ours.transform_net
    net = net.replace(
        initial_layer=copy_conv(net.initial_layer, ref.transform_net.initial_layer),
        blocks=tuple(
            ob.replace(
                conv_0=copy_conv(ob.conv_0, rb.conv_layers[0]),
                conv_1=copy_conv(ob.conv_1, rb.conv_layers[1]),
            )
            for ob, rb in zip(net.blocks, ref.transform_net.blocks)
        ),
        final_layer=expand_final_conv(
            net.final_layer, ref.transform_net.final_layer, d_tr, K),
    )
    ours = ours.replace(transform_net=net)

    z = RNG.uniform(-2.5, 2.5, size=(3, C, hw, hw)).astype(np.float32)
    _assert_flow_pair_matches(ours, ref, z)


def test_nn_helpers_match_reference():
    """utils/nn.py helpers: ClampExp (nn.py:78-93), ConstScaleLayer
    (nn.py:7-20), PeriodicFeaturesElementwise with learned weights + bias
    (nn.py:96-143), PeriodicFeaturesCat (nn.py:146-178), tile (nn.py:181-187)."""
    from normflows_tpu.utils.nn import (
        ClampExp, ConstScaleLayer, PeriodicFeaturesElementwise,
        PeriodicFeaturesCat, tile,
    )

    x = RNG.normal(size=(6, 5)).astype(np.float32)
    tx = torch.tensor(x)

    # reference ClampExp ignores its documented lam (nn.py:51-61 hardcodes
    # exp(x)); ours defaults lam=1.0 which matches that behavior
    assert_close(ClampExp()(jnp.asarray(x)), ref_nf.utils.ClampExp()(tx))
    assert_close(ConstScaleLayer(scale=2.5)(jnp.asarray(x)),
                 ref_nf.utils.ConstScaleLayer(2.5)(tx))

    torch.manual_seed(61)
    ref_pf = ref_nf.utils.nn.PeriodicFeaturesElementwise(
        5, [1, 3], torch.tensor([0.5, 2.0]), bias=True)
    with torch.no_grad():
        ref_pf.weights.add_(0.3 * torch.randn_like(ref_pf.weights))
        ref_pf.bias.add_(0.1 * torch.randn_like(ref_pf.bias))
    our_pf = PeriodicFeaturesElementwise.create(
        5, [1, 3], jnp.array([0.5, 2.0]), bias=True)
    our_pf = our_pf.replace(weights=t2j(ref_pf.weights), bias=t2j(ref_pf.bias))
    assert_close(our_pf(jnp.asarray(x)), ref_pf(tx), atol=1e-6)

    ref_cat = ref_nf.utils.nn.PeriodicFeaturesCat(5, [0, 2], torch.tensor([1.5, 0.25]))
    our_cat = PeriodicFeaturesCat.create(5, [0, 2], jnp.array([1.5, 0.25]))
    assert_close(our_cat(jnp.asarray(x)), ref_cat(tx), atol=1e-6)

    v = RNG.normal(size=(7,)).astype(np.float32)
    assert_close(tile(jnp.asarray(v), 3), ref_nf.utils.tile(torch.tensor(v), 3))


def test_prior_landscapes_match_reference():
    """2-D energy landscapes (prior.py:77-327): TwoModes, Sinusoidal,
    Sinusoidal_gap, Sinusoidal_split, Smiley log_probs, plus ImagePrior
    (density from image intensities, prior.py:21-104)."""
    from normflows_tpu.distributions import prior as our_prior

    z = RNG.uniform(-2.5, 2.5, size=(40, 2)).astype(np.float32)
    tz = torch.tensor(z)
    cases = [
        (our_prior.TwoModes(loc=2.0, scale=0.2),
         ref_nf.distributions.TwoModes(2.0, 0.2)),
        (our_prior.Sinusoidal(scale=1.0, period=1.0),
         ref_nf.distributions.Sinusoidal(1.0, 1.0)),
        (our_prior.Sinusoidal_gap(scale=1.0, period=1.0),
         ref_nf.distributions.Sinusoidal_gap(1.0, 1.0)),
        (our_prior.Sinusoidal_split(scale=1.0, period=1.0),
         ref_nf.distributions.Sinusoidal_split(1.0, 1.0)),
        (our_prior.Smiley(scale=1.0), ref_nf.distributions.Smiley(1.0)),
    ]
    for ours, ref in cases:
        assert_close(
            ours.log_prob(jnp.asarray(z)), ref.log_prob(tz),
            atol=1e-4, rtol=1e-4, msg=type(ref).__name__,
        )

    img = RNG.uniform(0.05, 1.0, size=(12, 10)).astype(np.float32)
    ref_ip = ref_nf.distributions.ImagePrior(img)
    our_ip = our_prior.ImagePrior.create(img)
    assert_close(
        our_ip.log_prob(jnp.asarray(z)), ref_ip.log_prob(tz),
        atol=1e-4, rtol=1e-4, msg="ImagePrior",
    )


def test_simple_encoders_and_shift_match_reference():
    """Dirac / Uniform encoders (encoder.py:38-70), ConstDiagGaussian
    (encoder.py:73-126) log_probs, and the Shift flow (transforms.py:50-77)."""
    from normflows_tpu.distributions.encoder import Dirac, Uniform, ConstDiagGaussian
    from normflows_tpu import transforms as our_transforms

    x = RNG.normal(size=(4, 3)).astype(np.float32)
    z = RNG.normal(size=(4, 2, 3)).astype(np.float32)
    tz, tx = torch.tensor(z), torch.tensor(x)

    assert_close(Dirac().log_prob(jnp.asarray(z), jnp.asarray(x)),
                 ref_nf.distributions.Dirac().log_prob(tz, tx))
    assert_close(
        Uniform(zmin=-1.5, zmax=2.0).log_prob(jnp.asarray(z), jnp.asarray(x)),
        ref_nf.distributions.Uniform(-1.5, 2.0).log_prob(tz, tx), atol=1e-6)

    loc = RNG.normal(size=(3,)).astype(np.float32)
    scale = RNG.uniform(0.5, 1.5, size=(3,)).astype(np.float32)
    ours_cdg = ConstDiagGaussian.create(loc, scale)
    ref_cdg = ref_nf.distributions.encoder.ConstDiagGaussian(
        torch.tensor(loc), torch.tensor(scale))
    assert_close(ours_cdg.log_prob(jnp.asarray(z), jnp.asarray(x)),
                 ref_cdg.log_prob(tz, tx), atol=1e-5)

    zb = RNG.normal(size=(6, 3)).astype(np.float32)
    ref_shift = ref_nf.transforms.Shift(torch.tensor([0.5, -1.0, 2.0]))
    our_shift = our_transforms.Shift(shift=jnp.array([0.5, -1.0, 2.0]))
    for direction in ("forward", "inverse"):
        zr, ldr = getattr(ref_shift, direction)(torch.tensor(zb))
        zo, ldo = getattr(our_shift, direction)(jnp.asarray(zb))
        assert_close(zo, zr, atol=1e-6, msg=f"Shift {direction}")
        assert_close(ldo, ldr, atol=1e-6, msg=f"Shift {direction} logdet")


def test_linear_interpolation_and_mh_proposal_match_reference():
    """LinearInterpolation (linear_interpolation.py:1-27) and
    DiagGaussianProposal.log_prob (mh_proposal.py:47-83)."""
    from normflows_tpu.distributions import LinearInterpolation
    from normflows_tpu.distributions.mh_proposal import DiagGaussianProposal

    torch.manual_seed(67)
    ref_d1 = ref_nf.distributions.DiagGaussian(2)
    ref_d2 = ref_nf.distributions.TwoMoons()
    with torch.no_grad():
        ref_d1.loc.add_(torch.randn_like(ref_d1.loc))
    our_d1 = distributions.DiagGaussian.create(2).replace(
        loc=t2j(ref_d1.loc), log_scale=t2j(ref_d1.log_scale))
    z = RNG.normal(size=(9, 2)).astype(np.float32)
    ref_li = ref_nf.distributions.LinearInterpolation(ref_d1, ref_d2, 0.3)
    our_li = LinearInterpolation(
        dist1=our_d1, dist2=distributions.TwoMoons(), alpha=0.3)
    assert_close(our_li.log_prob(jnp.asarray(z)),
                 ref_li.log_prob(torch.tensor(z)), atol=1e-5)

    ref_prop = ref_nf.distributions.DiagGaussianProposal((2,), 0.7)
    our_prop = DiagGaussianProposal.create(2, 0.7)
    z_ = RNG.normal(size=(9, 2)).astype(np.float32)
    assert_close(
        our_prop.log_prob(jnp.asarray(z_), jnp.asarray(z)),
        ref_prop.log_prob(torch.tensor(z_), torch.tensor(z)), atol=1e-5)


# ---------------------------------------------------------------------------
# Stochastic (MCMC) layers — injected-randomness oracles
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("steps", [1, 5])
def test_metropolis_hastings_injected_noise_matches_reference(steps, monkeypatch):
    """MH layer with replayed noise (stochastic.py:25-45): feed the reference
    identical proposal normals + accept uniforms by monkeypatching torch's
    draws, replay the same arrays through our ``noise=`` hook, and assert z'
    and the SNF log-det proxy match exactly."""
    from collections import deque

    batch, dim, scale = 48, 2, 0.5
    z0 = RNG.normal(size=(batch, dim)).astype(np.float32)
    eps = RNG.normal(size=(steps, batch, dim)).astype(np.float32)
    w = RNG.uniform(size=(steps, batch)).astype(np.float32)

    randn_q = deque(torch.tensor(e) for e in eps)
    rand_q = deque(torch.tensor(u) for u in w)
    real_randn, real_rand = torch.randn, torch.rand

    def _norm(size):
        return tuple(size[0]) if len(size) == 1 and isinstance(size[0], (tuple, list)) else tuple(size)

    def fake_randn(*size, **kw):
        out = randn_q.popleft()
        assert tuple(out.shape) == _norm(size), (out.shape, size)
        return out

    def fake_rand(*size, **kw):
        out = rand_q.popleft()
        assert tuple(out.shape) == _norm(size), (out.shape, size)
        return out

    monkeypatch.setattr(torch, "randn", fake_randn)
    monkeypatch.setattr(torch, "rand", fake_rand)
    try:
        ref_mh = ref_nf.flows.MetropolisHastings(
            ref_nf.distributions.TwoMoons(),
            ref_nf.distributions.DiagGaussianProposal((dim,), scale),
            steps,
        )
        z_ref, ld_ref = ref_mh(torch.tensor(z0))
    finally:
        monkeypatch.setattr(torch, "randn", real_randn)
        monkeypatch.setattr(torch, "rand", real_rand)
    assert not randn_q and not rand_q  # every injected draw was consumed

    from normflows_tpu.distributions.mh_proposal import DiagGaussianProposal
    from normflows_tpu.flows.stochastic import MetropolisHastings

    our_mh = MetropolisHastings(
        target=distributions.TwoMoons(),
        proposal=DiagGaussianProposal.create(dim, scale),
        steps=steps,
    )
    z_ours, ld_ours = our_mh.forward(jnp.asarray(z0), noise=(eps, w))
    assert_close(z_ours, z_ref, atol=1e-5, msg="MH z'")
    assert_close(ld_ours, ld_ref, atol=1e-5, msg="MH log_det proxy")

    # inverse == forward in both frameworks (stochastic.py:47-49)
    zi, ldi = our_mh.inverse(jnp.asarray(z0), noise=(eps, w))
    assert_close(zi, z_ours, atol=0)
    assert_close(ldi, ld_ours, atol=0)


@pytest.mark.parametrize(
    "steps,log_step,log_mass",
    [
        (1, [-2.0, -2.0], [0.0, 0.0]),
        (4, [-1.5, -2.5], [0.3, -0.4]),  # learnable per-dim values
    ],
)
def test_hmc_injected_noise_matches_reference(steps, log_step, log_mass, monkeypatch):
    """HMC layer (stochastic.py:74-109): identical momenta + accept uniforms
    on both sides; z' and log-det proxy must agree through the leapfrog."""
    batch, dim = 48, 2
    z0 = RNG.normal(size=(batch, dim)).astype(np.float32)
    p_eps = RNG.normal(size=(batch, dim)).astype(np.float32)
    u = RNG.uniform(size=(batch,)).astype(np.float32)

    monkeypatch.setattr(torch, "randn_like", lambda x, **kw: torch.tensor(p_eps))
    monkeypatch.setattr(torch, "rand_like", lambda x, **kw: torch.tensor(u))
    ref_hmc = ref_nf.flows.HamiltonianMonteCarlo(
        ref_nf.distributions.TwoMoons(),
        steps,
        torch.tensor(log_step),
        torch.tensor(log_mass),
    )
    z_ref, ld_ref = ref_hmc(torch.tensor(z0))
    monkeypatch.undo()

    from normflows_tpu.flows.stochastic import HamiltonianMonteCarlo

    our_hmc = HamiltonianMonteCarlo.create(
        distributions.TwoMoons(), steps, log_step, log_mass
    )
    z_ours, ld_ours = our_hmc.forward(jnp.asarray(z0), noise=(p_eps, u))
    assert_close(z_ours, z_ref, atol=2e-5, msg="HMC z'")
    assert_close(ld_ours, ld_ref, atol=2e-5, msg="HMC log_det proxy")


# ---------------------------------------------------------------------------
# Residual flows — deterministic oracles (weight-copied)
# ---------------------------------------------------------------------------

def _copy_lipschitz_mlp(our_net, ref_net):
    """Copy reference LipschitzMLP weights, biases, Swish betas AND the
    power-iteration u/v/scale buffers so both nets are the same function
    (nets/lipschitz.py:223-270: forward uses compute_weight(update=False),
    i.e. the stored u/v determine the spectral normalization)."""
    copied = []
    for ol, rl in zip(our_net.layers, ref_net.net):
        if hasattr(ol, "beta"):  # Swish
            copied.append(ol.replace(beta=t2j(rl.beta)))
        else:  # InducedNormLinear
            copied.append(ol.replace(
                weight=t2j(rl.weight), bias=t2j(rl.bias),
                u=t2j(rl.u), v=t2j(rl.v), scale=t2j(rl.scale),
            ))
    return our_net.replace(layers=tuple(copied))


def _matched_lipschitz_pair(dims, seed=7, lipschitz_const=0.9):
    from normflows_tpu.nets import LipschitzMLP

    torch.manual_seed(seed)
    ref_net = ref_nf.nets.LipschitzMLP(
        dims, init_zeros=False, lipschitz_const=lipschitz_const)
    our_net = LipschitzMLP.create(
        jax.random.key(seed), dims, lipschitz_const=lipschitz_const,
        init_zeros=False)
    return _copy_lipschitz_mlp(our_net, ref_net), ref_net


def test_lipschitz_mlp_forward_and_power_iteration_match_reference():
    """LipschitzMLP forward parity with copied u/v state, and again after a
    matched deterministic power-iteration refresh on both sides
    (utils/optim.py:28-31 / nets/lipschitz.py:223-270)."""
    from normflows_tpu.utils import update_lipschitz

    our_net, ref_net = _matched_lipschitz_pair([2, 32, 32, 2])
    x = RNG.normal(size=(16, 2)).astype(np.float32)
    assert_close(our_net(jnp.asarray(x)), ref_net(torch.tensor(x)), atol=1e-5,
                 msg="LipschitzMLP forward")

    # Power iteration from identical u/v is deterministic: refresh both.
    ref_nf.utils.update_lipschitz(ref_net, 10)
    our_net2 = update_lipschitz(our_net, 10)
    assert_close(our_net2(jnp.asarray(x)), ref_net(torch.tensor(x)), atol=1e-5,
                 msg="LipschitzMLP forward after update_lipschitz")
    for ol, rl in zip(our_net2.layers, ref_net.net):
        if hasattr(ol, "scale"):
            assert_close(ol.u, rl.u, atol=1e-5)
            assert_close(ol.v, rl.v, atol=1e-5)


def test_iresblock_brute_force_matches_reference():
    """Brute-force 2-D Jacobian determinant (residual.py:148-161):
    weight-copied iResBlock forward value + log-det, fully deterministic."""
    from normflows_tpu.flows.residual import iResBlock

    our_net, ref_net = _matched_lipschitz_pair([2, 24, 24, 2], seed=11)
    ref_block = ref_nf.flows.residual.iResBlock(ref_net, brute_force=True)
    our_block = iResBlock.create(our_net, brute_force=True)

    x = (0.7 * RNG.normal(size=(20, 2))).astype(np.float32)
    logp0 = np.zeros((20,), np.float32)
    y_ref, lp_ref = ref_block(torch.tensor(x), torch.tensor(logp0).view(-1, 1))
    y_ours, lp_ours = our_block.apply_forward(jnp.asarray(x), jnp.asarray(logp0))
    assert_close(y_ours, y_ref, atol=1e-5, msg="iResBlock brute-force y")
    assert_close(lp_ours, lp_ref.view(-1), atol=1e-5, msg="brute-force logp")

    # Fixed-point inverse round-trips to the same point on both sides
    # (residual.py:133-142 vs our lax.while_loop).
    x_ref = ref_block.inverse(torch.tensor(np.asarray(y_ours)))
    x_ours = our_block._inverse_fixed_point(y_ours)
    assert_close(x_ours, x, atol=1e-4, msg="fixed-point inverse vs input")
    assert_close(x_ours, x_ref, atol=1e-4, msg="fixed-point inverse vs ref")


def test_iresblock_exact_trace_matches_reference():
    """Exact-trace power series (residual.py:229-242) with fixed
    n_power_series while training — deterministic on both sides."""
    from normflows_tpu.flows.residual import iResBlock

    our_net, ref_net = _matched_lipschitz_pair([3, 24, 24, 3], seed=13)
    k = 8
    ref_block = ref_nf.flows.residual.iResBlock(
        ref_net, exact_trace=True, n_power_series=k)
    our_block = iResBlock.create(our_net, exact_trace=True, n_power_series=k)

    x = (0.5 * RNG.normal(size=(12, 3))).astype(np.float32)
    logp0 = np.zeros((12,), np.float32)
    y_ref, lp_ref = ref_block(torch.tensor(x), torch.tensor(logp0).view(-1, 1))
    y_ours, lp_ours = our_block.apply_forward(jnp.asarray(x), jnp.asarray(logp0))
    assert_close(y_ours, y_ref, atol=1e-5, msg="exact-trace y")
    assert_close(lp_ours, lp_ref.view(-1), atol=1e-5, msg="exact-trace logp")


def test_residual_wrapper_brute_force_matches_reference():
    """Residual facade layer (residual.py:12-75, reverse=True): forward is
    iresblock.inverse with negated log-det — check both directions."""
    from normflows_tpu import flows as our_flows

    our_net, ref_net = _matched_lipschitz_pair([2, 16, 16, 2], seed=17)
    ref_res = ref_nf.flows.Residual(ref_net, reduce_memory=False,
                                    brute_force=True)
    our_res = our_flows.Residual.create(our_net, reduce_memory=False,
                                        brute_force=True)

    z = (0.6 * RNG.normal(size=(10, 2))).astype(np.float32)
    z_ref, ld_ref = ref_res.inverse(torch.tensor(z))
    z_ours, ld_ours = our_res.inverse(jnp.asarray(z))
    assert_close(z_ours, z_ref, atol=1e-5, msg="Residual.inverse z")
    assert_close(ld_ours, ld_ref, atol=1e-5, msg="Residual.inverse log_det")

    zf_ref, ldf_ref = ref_res(torch.tensor(z))
    zf_ours, ldf_ours = our_res.forward(jnp.asarray(z))
    assert_close(zf_ours, zf_ref, atol=1e-4, msg="Residual.forward z")
    assert_close(ldf_ours, ldf_ref, atol=1e-4, msg="Residual.forward log_det")


def test_transposed_pipeline_matches_reference_directly():
    """The TPU fast path (transposed MADE + planar spline kernel,
    docs/performance.md round-4 harvest) oracled DIRECTLY against the
    reference torch layer — not just transitively via the jnp path.  Runs
    the Pallas kernels in interpret mode; batch >= 1024 engages the gate."""
    from normflows_tpu.ops import backend

    D, K, hidden, blocks = 2, 10, 64, 1
    torch.manual_seed(3)
    ref = ref_nf.flows.CircularAutoregressiveRationalQuadraticSpline(
        D, blocks, hidden, ind_circ=[1], num_bins=K,
        tail_bound=torch.tensor([5.0, np.pi]), permute_mask=True,
        init_identity=False,
    )
    ours = flows.CircularAutoregressiveRationalQuadraticSpline.create(
        jax.random.key(0), D, blocks, hidden, ind_circ=[1], num_bins=K,
        tail_bound=jnp.array([5.0, np.pi]), permute_mask=True,
        init_identity=False,
    )
    ours = ours.replace(
        mprqat=ours.mprqat.replace(
            autoregressive_net=copy_made(
                ours.mprqat.autoregressive_net, ref.mprqat.autoregressive_net,
                D, K, "list",
            )
        )
    )
    z = np.stack(
        [RNG.uniform(-4.5, 4.5, size=1024), RNG.uniform(-3.0, 3.0, size=1024)],
        axis=1,
    ).astype(np.float32)

    backend.set_kernel_backend("pallas")
    backend.set_pallas_interpret(True)
    try:
        assert ours.mprqat._transposed_ok(jnp.asarray(z), None)
        for direction in ("forward", "inverse"):
            z_ref, ld_ref = getattr(ref, direction)(torch.tensor(z))
            z_ours, ld_ours = getattr(ours, direction)(jnp.asarray(z))
            assert_close(z_ours, z_ref, atol=5e-5, rtol=5e-5,
                         msg=f"transposed {direction} z")
            assert_close(ld_ours, ld_ref, atol=5e-4, rtol=5e-4,
                         msg=f"transposed {direction} log_det")
    finally:
        backend.set_kernel_backend("auto")
        backend.set_pallas_interpret(False)


@pytest.mark.parametrize("domain,codomain", [(1, 2), (2, float("inf")),
                                             (2, 1), (1.5, 2.5)])
def test_induced_norm_general_p_matches_reference(domain, codomain):
    """General fixed-p induced norms (lipschitz.py:659-689): copied
    weight/u/v state, matched power-iteration refresh on both sides, forward
    parity.  (p=2 is covered by the LipschitzMLP oracle above.)"""
    torch.manual_seed(23)
    ref_lin = ref_nf.nets.lipschitz.InducedNormLinear(
        6, 5, coeff=0.9, domain=domain, codomain=codomain, n_iterations=5)
    from normflows_tpu.nets.lipschitz import InducedNormLinear

    our_lin = InducedNormLinear.create(
        jax.random.key(0), 6, 5, coeff=0.9, domain=domain, codomain=codomain,
        n_iterations=5)
    our_lin = our_lin.replace(
        weight=t2j(ref_lin.weight), bias=t2j(ref_lin.bias),
        u=t2j(ref_lin.u), v=t2j(ref_lin.v), scale=t2j(ref_lin.scale))

    x = RNG.normal(size=(7, 6)).astype(np.float32)
    assert_close(our_lin(jnp.asarray(x)),
                 ref_lin(torch.tensor(x)), atol=1e-5,
                 msg=f"forward p=({domain},{codomain})")

    # deterministic refresh from identical u/v
    ref_lin.compute_weight(update=True, n_iterations=8)
    ours2 = our_lin.update_power_iteration(n_iterations=8)
    assert_close(ours2.u, ref_lin.u, atol=1e-4)
    assert_close(ours2.v, ref_lin.v, atol=1e-4)
    assert_close(ours2(jnp.asarray(x)), ref_lin(torch.tensor(x)), atol=1e-5,
                 msg=f"forward after refresh p=({domain},{codomain})")


@pytest.mark.parametrize("domain,codomain", [(2, 2), (1, 2),
                                             (2, float("inf")), (1.5, 2.5)])
def test_induced_norm_conv_general_p_matches_reference(domain, codomain):
    """General fixed-p induced norms through the CONV power iteration
    (reference _compute_weight_kxk + normalize helpers,
    lipschitz.py:533-610, 659-689): copied weight/u/v state, matched
    refresh, forward parity."""
    torch.manual_seed(29)
    H = W = 5
    ref_conv = ref_nf.nets.lipschitz.InducedNormConv2d(
        3, 4, kernel_size=3, stride=1, padding=1, coeff=0.9,
        domain=domain, codomain=codomain, n_iterations=5)
    # trigger the reference's lazy spatial init + u/v setup
    x0 = torch.randn(2, 3, H, W)
    with torch.no_grad():
        ref_conv(x0)

    from normflows_tpu.nets.lipschitz import InducedNormConv2d

    ours = InducedNormConv2d.create(
        jax.random.key(0), 3, 4, 3, (H, W), coeff=0.9,
        domain=domain, codomain=codomain, n_iterations=5)
    ours = ours.replace(
        weight=t2j(ref_conv.weight), bias=t2j(ref_conv.bias),
        u=t2j(ref_conv.u), v=t2j(ref_conv.v), scale=t2j(ref_conv.scale))

    x = RNG.normal(size=(2, 3, H, W)).astype(np.float32)
    assert_close(ours(jnp.asarray(x)), ref_conv(torch.tensor(x)), atol=1e-5,
                 msg=f"conv forward p=({domain},{codomain})")

    # deterministic refresh from identical u/v
    ref_conv.compute_weight(update=True, n_iterations=8)
    ours2 = ours.update_power_iteration(n_iterations=8)
    assert_close(ours2.u, ref_conv.u, atol=1e-4)
    assert_close(ours2.v, ref_conv.v, atol=1e-4)
    assert_close(ours2(jnp.asarray(x)), ref_conv(torch.tensor(x)), atol=1e-5,
                 msg=f"conv forward after refresh p=({domain},{codomain})")
