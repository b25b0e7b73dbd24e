"""Reference-vs-ours quality comparison on identical data (QUALITY.md rows).

Trains the torch reference (``/root/reference``, CPU) and normflows_tpu on the
SAME .npz dataset at the same (reduced) config and prints both converged
metrics as JSON lines:

    python examples/quality_compare.py glow      # bits/dim, L=2 K=4 hidden 64
    python examples/quality_compare.py residual  # TwoMoons held-out log-lik
    python examples/quality_compare.py vae       # test -ELBO (vae.py recipe)

Reference configs: examples/glow.ipynb (reduced), examples/residual.ipynb
(reduced iters), examples/vae.py (synthetic MNIST-geometry data).  The torch
side uses the reference package itself as the oracle; no reference code is
copied into the framework.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

DATA_DIR = "/tmp/quality_data"


# ---------------------------------------------------------------------------
# shared datasets
# ---------------------------------------------------------------------------


def glow_dataset(path, n=4096, hw=8, num_classes=4):
    """Class-dependent smooth random fields quantized to 256 levels."""
    if os.path.exists(path):
        d = np.load(path)
        return d["x"], d["y"]
    rng = np.random.default_rng(7)
    y = rng.integers(0, num_classes, size=n)
    freqs = rng.uniform(0.5, 3.0, size=(num_classes, 3, 4, 2))
    phase = rng.uniform(0, 2 * np.pi, size=(num_classes, 3, 4, 2))
    h = np.linspace(0, 2 * np.pi, hw)[:, None]
    w = np.linspace(0, 2 * np.pi, hw)[None, :]
    x = np.zeros((n, 3, hw, hw), np.float32)
    for i in range(n):
        f, p = freqs[y[i]], phase[y[i]]
        img = sum(
            np.sin(f[:, k, 0, None, None] * h + p[:, k, 0, None, None])
            * np.cos(f[:, k, 1, None, None] * w + p[:, k, 1, None, None])
            for k in range(4)
        )
        img = (img - img.min()) / (img.max() - img.min() + 1e-6)
        x[i] = img
    x = np.round(x * 255.0) / 255.0
    np.savez(path, x=x, y=y)
    return x, y


def twomoons_dataset(path, n=2**14):
    if os.path.exists(path):
        return np.load(path)["x"]
    import jax
    from normflows_tpu import distributions

    # our TwoMoons sampler (log_prob parity-tested against the reference,
    # tests/test_reference_parity.py::test_target_log_prob_matches_reference)
    x = np.asarray(distributions.TwoMoons().sample(jax.random.key(11), n),
                   np.float32)
    np.savez(path, x=x)
    return x


def digits_dataset(path, n=2**14, d=784):
    """Low-rank Bernoulli patterns with MNIST geometry (784 binary dims)."""
    if os.path.exists(path):
        return np.load(path)["x"]
    rng = np.random.default_rng(13)
    protos = 1.0 / (1.0 + np.exp(-3 * rng.standard_normal((16, d))))
    idx = rng.integers(0, 16, size=n)
    x = (rng.uniform(size=(n, d)) < protos[idx]).astype(np.float32)
    np.savez(path, x=x)
    return x


def emit(row):
    print(json.dumps(row), flush=True)


# ---------------------------------------------------------------------------
# GLOW: bits/dim on shared synthetic images (glow.ipynb reduced: L=2 K=4 h=64)
# ---------------------------------------------------------------------------


GLOW_CFG = dict(L=2, K=4, hidden=64, batch=64, lr=1e-3, wd=1e-5,
                num_classes=4, hw=8)


def glow_reference(x, y, iters):
    import torch

    sys.path.insert(0, "/root/reference")
    import normflows as ref_nf

    torch.manual_seed(0)
    L, K, hidden = GLOW_CFG["L"], GLOW_CFG["K"], GLOW_CFG["hidden"]
    C, H, W = 3, GLOW_CFG["hw"], GLOW_CFG["hw"]
    q0, merges, flows_ = [], [], []
    for i in range(L):
        fl = [ref_nf.flows.GlowBlock(C * 2 ** (L + 1 - i), hidden,
                                     split_mode="channel", scale=True)
              for _ in range(K)]
        fl += [ref_nf.flows.Squeeze()]
        flows_ += [fl]
        if i > 0:
            merges += [ref_nf.flows.Merge()]
            latent_shape = (C * 2 ** (L - i), H // 2 ** (L - i), W // 2 ** (L - i))
        else:
            latent_shape = (C * 2 ** (L + 1), H // 2 ** L, W // 2 ** L)
        q0 += [ref_nf.distributions.ClassCondDiagGaussian(
            latent_shape, GLOW_CFG["num_classes"])]
    model = ref_nf.MultiscaleFlow(q0, flows_, merges)
    opt = torch.optim.Adamax(model.parameters(), lr=GLOW_CFG["lr"],
                             weight_decay=GLOW_CFG["wd"])

    def dequant(xb, gen):
        xb = xb * 255.0 / 256.0
        return xb + torch.rand(xb.shape, generator=gen) / 256.0

    gen = torch.Generator().manual_seed(1)
    n_train = x.shape[0] - 1024
    xt = torch.tensor(x[:n_train])
    yt = torch.tensor(y[:n_train])
    B = GLOW_CFG["batch"]
    t0 = time.time()
    for i in range(iters):
        s = (i * B) % (n_train - B)
        xb = dequant(xt[s:s + B], gen)
        loss = model.forward_kld(xb, yt[s:s + B])
        if not (torch.isnan(loss) | torch.isinf(loss)):
            opt.zero_grad()
            loss.backward()
            opt.step()
    wall = time.time() - t0

    n_dims = 3 * H * W
    model.eval()
    with torch.no_grad():
        xe = dequant(torch.tensor(x[-1024:]), gen)
        nll = -model.log_prob(xe, torch.tensor(y[-1024:])).numpy()
    bpd = np.nansum(nll / np.log(2) / n_dims + 8) / np.sum(~np.isnan(nll))
    return float(bpd), wall


def glow_ours(x, y, iters):
    import jax
    import jax.numpy as jnp
    import optax
    import normflows_tpu as nf
    from normflows_tpu.utils import preprocessing
    from examples.glow_image import build_glow

    model = build_glow(GLOW_CFG["L"], GLOW_CFG["K"], GLOW_CFG["hidden"],
                       (3, GLOW_CFG["hw"], GLOW_CFG["hw"]),
                       GLOW_CFG["num_classes"])
    scale = preprocessing.Scale(255.0 / 256.0)
    jitter = preprocessing.Jitter(1.0 / 256.0)
    n_train = x.shape[0] - 1024
    x_all = jnp.asarray(x[:n_train])
    y_all = jnp.asarray(y[:n_train].astype(np.int32))
    B = GLOW_CFG["batch"]
    model = model.init_actnorm(
        jitter(scale(x_all[:B]), jax.random.key(8)), y_all[:B]
    )
    opt = optax.chain(optax.add_decayed_weights(GLOW_CFG["wd"]),
                      optax.adamax(GLOW_CFG["lr"]))
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, xb, yb, key):
        xb = jitter(scale(xb), key)

        def loss_fn(d):
            return nf.combine(d, rest).forward_kld(xb, yb)

        loss, grads = jax.value_and_grad(loss_fn)(diff)
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    key = jax.random.key(0)
    t0 = time.time()
    for i in range(iters):
        s = (i * B) % (n_train - B)
        key, sub = jax.random.split(key)
        diff, opt_state, loss = step(
            diff, opt_state, x_all[s:s + B], y_all[s:s + B], sub
        )
    jax.block_until_ready(loss)
    wall = time.time() - t0

    model = nf.combine(diff, rest)
    n_dims = 3 * GLOW_CFG["hw"] ** 2
    xe = jitter(scale(jnp.asarray(x[-1024:])), jax.random.key(9))
    nll = np.asarray(-model.log_prob(xe, jnp.asarray(y[-1024:].astype(np.int32))))
    bpd = np.nansum(nll / np.log(2) / n_dims + 8) / np.sum(~np.isnan(nll))
    return float(bpd), wall


# ---------------------------------------------------------------------------
# RESIDUAL: held-out log-lik on shared TwoMoons data (residual.ipynb reduced)
# ---------------------------------------------------------------------------


RES_CFG = dict(K=8, hidden=64, batch=256, lr=3e-4, lip=0.9, lip_iters=10)


def residual_reference(x, iters):
    import torch

    sys.path.insert(0, "/root/reference")
    import normflows as ref_nf

    torch.manual_seed(0)
    K, hidden = RES_CFG["K"], RES_CFG["hidden"]
    layers = []
    for _ in range(K):
        net = ref_nf.nets.LipschitzMLP(
            [2, hidden, hidden, 2], init_zeros=True, lipschitz_const=RES_CFG["lip"]
        )
        layers += [ref_nf.flows.Residual(net, reduce_memory=True),
                   ref_nf.flows.ActNorm(2)]
    model = ref_nf.NormalizingFlow(ref_nf.distributions.DiagGaussian(2), layers)
    # trigger ActNorm init (residual.ipynb 'Initialize ActNorm' cell)
    with torch.no_grad():
        model.log_prob(torch.tensor(x[:256]))
    opt = torch.optim.Adam(model.parameters(), lr=RES_CFG["lr"])
    xt = torch.tensor(x)
    n_train = x.shape[0] - 2048
    B = RES_CFG["batch"]
    t0 = time.time()
    for i in range(iters):
        s = (i * B) % (n_train - B)
        loss = model.forward_kld(xt[s:s + B])
        if not (torch.isnan(loss) | torch.isinf(loss)):
            opt.zero_grad()
            loss.backward()
            opt.step()
        ref_nf.utils.update_lipschitz(model, RES_CFG["lip_iters"])
    wall = time.time() - t0
    model.eval()
    with torch.no_grad():
        ll = model.log_prob(xt[n_train:]).mean().item()
    return float(ll), wall


def _build_ref_residual_model():
    """The reference model exactly as residual_reference builds it (seed 0),
    BEFORE ActNorm init / training — used as a shared initialization."""
    import torch

    sys.path.insert(0, "/root/reference")
    import normflows as ref_nf

    torch.manual_seed(0)
    K, hidden = RES_CFG["K"], RES_CFG["hidden"]
    layers = []
    for _ in range(K):
        net = ref_nf.nets.LipschitzMLP(
            [2, hidden, hidden, 2], init_zeros=True,
            lipschitz_const=RES_CFG["lip"]
        )
        layers += [ref_nf.flows.Residual(net, reduce_memory=True),
                   ref_nf.flows.ActNorm(2)]
    return ref_nf.NormalizingFlow(ref_nf.distributions.DiagGaussian(2), layers)


def _copy_ref_residual_init(our_model, ref_model):
    """Controlled-initialization copy: reference LipschitzMLP weights, biases,
    Swish betas AND power-iteration u/v/scale buffers into our pytree, plus
    the DiagGaussian base params.  ActNorms are data-initialized identically
    on both sides afterwards, so the two frameworks start from the SAME
    function."""
    import jax.numpy as jnp

    def t2j(t):
        return jnp.asarray(t.detach().cpu().numpy())

    new_flows = []
    for ours, ref in zip(our_model.flows, ref_model.flows):
        if hasattr(ours, "iresblock"):  # Residual layer
            our_layers = list(ours.iresblock.nnet.layers)
            ref_mods = list(ref.iresblock.nnet.net)
            copied = []
            for ol, rl in zip(our_layers, ref_mods):
                if hasattr(ol, "beta"):  # Swish
                    copied.append(ol.replace(beta=t2j(rl.beta)))
                else:  # InducedNormLinear
                    copied.append(ol.replace(
                        weight=t2j(rl.weight), bias=t2j(rl.bias),
                        u=t2j(rl.u), v=t2j(rl.v), scale=t2j(rl.scale),
                    ))
            new_flows.append(ours.replace(
                iresblock=ours.iresblock.replace(
                    nnet=ours.iresblock.nnet.replace(layers=tuple(copied)))))
        else:
            new_flows.append(ours)
    return our_model.replace(
        flows=tuple(new_flows),
        q0=our_model.q0.replace(
            loc=t2j(ref_model.q0.loc), log_scale=t2j(ref_model.q0.log_scale)
        ),
    )


def residual_ours(x, iters, copied_init=False):
    import jax
    import jax.numpy as jnp
    import optax
    import normflows_tpu as nf
    from normflows_tpu import flows, distributions
    from normflows_tpu.nets import LipschitzMLP
    from normflows_tpu.utils import update_lipschitz

    K, hidden = RES_CFG["K"], RES_CFG["hidden"]
    layers = []
    for i in range(K):
        net = LipschitzMLP.create(jax.random.key(i), [2, hidden, hidden, 2],
                                  lipschitz_const=RES_CFG["lip"], init_zeros=True)
        layers.append(flows.Residual.create(net, reduce_memory=True))
        layers.append(flows.ActNorm.create((2,)))
    model = nf.NormalizingFlow.create(distributions.DiagGaussian.create(2), layers)
    if copied_init:
        model = _copy_ref_residual_init(model, _build_ref_residual_model())
    x_all = jnp.asarray(x)
    n_train = x.shape[0] - 2048
    model = model.init_actnorm(x_all[:256])

    opt = optax.adam(RES_CFG["lr"])
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, rest, opt_state, xb, key):
        def loss_fn(d):
            return nf.combine(d, rest).forward_kld(xb, key=key)

        loss, grads = jax.value_and_grad(loss_fn)(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    @jax.jit
    def lip_step(diff, rest):
        m = update_lipschitz(nf.combine(diff, rest), RES_CFG["lip_iters"])
        return nf.partition(m)

    key = jax.random.key(3)
    B = RES_CFG["batch"]
    t0 = time.time()
    for i in range(iters):
        s = (i * B) % (n_train - B)
        key, sub = jax.random.split(key)
        diff, opt_state, loss = step(diff, rest, opt_state, x_all[s:s + B], sub)
        diff, rest = lip_step(diff, rest)
    jax.block_until_ready(loss)
    wall = time.time() - t0

    model = nf.combine(diff, rest)
    model = model.replace(flows=tuple(
        f.set_train(False) if hasattr(f, "set_train") else f for f in model.flows
    ))
    ll = float(jnp.mean(model.log_prob(x_all[n_train:], key=jax.random.key(4))))
    return ll, wall


# ---------------------------------------------------------------------------
# VAE: test -ELBO on shared binarized digits (vae.py recipe: Planar K=10)
# ---------------------------------------------------------------------------


VAE_CFG = dict(latent=40, K=10, batch=256, lr=1e-3)


def vae_reference(x, epochs):
    import torch
    from torch import nn
    from torch.distributions.normal import Normal
    import torch.nn.functional as F

    sys.path.insert(0, "/root/reference")
    import normflows as ref_nf

    torch.manual_seed(15)
    d, latent = x.shape[1], VAE_CFG["latent"]

    # FlowVAE architecture from reference examples/vae.py:197-253
    class FlowVAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.encode = nn.Sequential(
                nn.Linear(d, 512), nn.ReLU(True), nn.Linear(512, 256),
                nn.ReLU(True),
            )
            self.f1 = nn.Linear(256, latent)
            self.f2 = nn.Linear(256, latent)
            self.decode = nn.Sequential(
                nn.Linear(latent, 256), nn.ReLU(True), nn.Linear(256, 512),
                nn.ReLU(True), nn.Linear(512, d),
            )
            self.flows = nn.ModuleList(
                [ref_nf.flows.Planar((latent,)) for _ in range(VAE_CFG["K"])]
            )

        def forward(self, xb):
            h = self.encode(xb)
            mu, log_var = self.f1(h), self.f2(h)
            std = torch.exp(0.5 * log_var)
            z0 = mu + torch.randn_like(std) * std
            z, log_det = z0, 0.0
            for fl in self.flows:
                z, ld = fl(z)
                log_det = log_det + ld
            q0 = Normal(mu, torch.exp(0.5 * log_var))
            p = Normal(0.0, 1.0)
            kld = (-torch.sum(p.log_prob(z), -1)
                   + torch.sum(q0.log_prob(z0), -1) - log_det.view(-1))
            out = torch.sigmoid(self.decode(z))
            return out, kld

    model = FlowVAE()
    opt = torch.optim.Adam(model.parameters(), lr=VAE_CFG["lr"])
    n_train = x.shape[0] - 2048
    xt = torch.tensor(x[:n_train])
    B = VAE_CFG["batch"]
    steps = n_train // B
    t0 = time.time()
    for e in range(epochs):
        beta = min(1.0, 0.01 + (e + 1) / epochs)  # vae.py anneal()
        perm = torch.randperm(n_train)
        for i in range(steps):
            xb = xt[perm[i * B:(i + 1) * B]]
            out, kld = model(xb)
            loss = F.binary_cross_entropy(out, xb, reduction="sum") + beta * kld.sum()
            opt.zero_grad()
            loss.backward()
            opt.step()
    wall = time.time() - t0
    model.eval()
    with torch.no_grad():
        xe = torch.tensor(x[n_train:])
        out, kld = model(xe)
        test_loss = (F.binary_cross_entropy(out, xe, reduction="sum")
                     + kld.sum()).item() / xe.shape[0]
    return float(test_loss), wall


def vae_ours(x, epochs):
    import jax
    import jax.numpy as jnp
    import optax
    import normflows_tpu as nf
    from normflows_tpu import flows, distributions
    from normflows_tpu.nets import MLP

    d, latent = x.shape[1], VAE_CFG["latent"]
    key = jax.random.key(15)
    k_enc, k_dec, key = jax.random.split(key, 3)
    encoder_net = MLP.create(k_enc, [d, 512, 256, 2 * latent])
    decoder_net = MLP.create(k_dec, [latent, 256, 512, d])
    vae = nf.NormalizingFlowVAE.create(
        distributions.DiagGaussian.create(latent),
        distributions.NNDiagGaussian(net=encoder_net),
        [flows.Planar.create((latent,), key=jax.random.fold_in(key, i))
         for i in range(VAE_CFG["K"])],
        distributions.NNBernoulliDecoder(net=decoder_net),
    )
    opt = optax.adam(VAE_CFG["lr"])
    diff, rest = nf.partition(vae)
    opt_state = opt.init(diff)
    n_train = x.shape[0] - 2048
    x_all = jnp.asarray(x[:n_train])
    B = VAE_CFG["batch"]
    steps = n_train // B

    @jax.jit
    def step(diff, opt_state, xb, key, beta):
        def ref_bound(d_):
            # reference bound (vae.py:260-266): BCE reconstruction +
            # beta * KLD where KLD = log q(z) - log prior(z).  Our VAE facade
            # returns log_p = prior + decoder jointly, so split it back out.
            m = nf.combine(d_, rest)
            z, log_q, log_p_joint = m(key, xb, num_samples=1)
            prior_ll = m.prior.log_prob(z.reshape(-1, latent)).reshape(log_q.shape)
            rec_ll = log_p_joint - prior_ll
            kld = log_q - prior_ll
            return jnp.mean(-rec_ll + beta * kld)

        loss, grads = jax.value_and_grad(ref_bound)(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    t0 = time.time()
    for e in range(epochs):
        beta = min(1.0, 0.01 + (e + 1) / epochs)
        perm = jax.random.permutation(jax.random.fold_in(key, 100 + e), n_train)
        xs = x_all[perm]
        for i in range(steps):
            key, sub = jax.random.split(key)
            diff, opt_state, loss = step(
                diff, opt_state, xs[i * B:(i + 1) * B], sub,
                jnp.float32(beta),
            )
    jax.block_until_ready(loss)
    wall = time.time() - t0

    vae = nf.combine(diff, rest)
    xe = jnp.asarray(x[n_train:])
    _, log_q, log_p = vae(jax.random.key(99), xe, num_samples=1)
    test_loss = float(-jnp.mean(log_p - log_q))
    return test_loss, wall


# ---------------------------------------------------------------------------


def main():
    from normflows_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # persistent XLA cache (docs/performance.md)
    ap = argparse.ArgumentParser()
    ap.add_argument("task", choices=["glow", "residual", "vae"])
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--side", choices=["both", "ref", "ours"], default="both")
    ap.add_argument("--copied-init", action="store_true",
                    help="residual task: start OUR model from the reference's "
                         "exact initial weights (controlled-init comparison)")
    args = ap.parse_args()
    os.makedirs(DATA_DIR, exist_ok=True)

    if args.task == "glow":
        iters = args.iters or 800
        x, y = glow_dataset(os.path.join(DATA_DIR, "glow8.npz"))
        if args.side in ("both", "ours"):
            bpd, wall = glow_ours(x, y, iters)
            emit({"task": "glow", "side": "ours", "bits_per_dim": round(bpd, 4),
                  "iters": iters, "wall_s": round(wall, 1), **GLOW_CFG})
        if args.side in ("both", "ref"):
            bpd, wall = glow_reference(x, y, iters)
            emit({"task": "glow", "side": "reference", "bits_per_dim": round(bpd, 4),
                  "iters": iters, "wall_s": round(wall, 1), **GLOW_CFG})
    elif args.task == "residual":
        iters = args.iters or 1500
        x = twomoons_dataset(os.path.join(DATA_DIR, "twomoons.npz"))
        if args.side in ("both", "ours"):
            ll, wall = residual_ours(x, iters, copied_init=args.copied_init)
            emit({"task": "residual", "side": "ours",
                  "copied_init": args.copied_init,
                  "heldout_loglik": round(ll, 4), "iters": iters,
                  "wall_s": round(wall, 1), **RES_CFG})
        if args.side in ("both", "ref"):
            ll, wall = residual_reference(x, iters)
            emit({"task": "residual", "side": "reference",
                  "heldout_loglik": round(ll, 4), "iters": iters,
                  "wall_s": round(wall, 1), **RES_CFG})
    else:
        epochs = args.iters or 5
        x = digits_dataset(os.path.join(DATA_DIR, "digits.npz"))
        if args.side in ("both", "ours"):
            tl, wall = vae_ours(x, epochs)
            emit({"task": "vae", "side": "ours", "test_neg_elbo": round(tl, 3),
                  "epochs": epochs, "wall_s": round(wall, 1), **VAE_CFG})
        if args.side in ("both", "ref"):
            tl, wall = vae_reference(x, epochs)
            emit({"task": "vae", "side": "reference",
                  "test_neg_elbo": round(tl, 3), "epochs": epochs,
                  "wall_s": round(wall, 1), **VAE_CFG})


if __name__ == "__main__":
    main()
