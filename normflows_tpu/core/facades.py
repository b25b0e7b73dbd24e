"""Model facades (reference: normflows/core.py:9-701), pure-functional.

Every facade is a pytree Module: pass it straight through ``jax.jit`` /
``jax.grad``.  Training losses are ordinary methods; PRNG keys are explicit.
The layer loop (core.py:51-55, 98-100) is a Python loop unrolled at trace time
— XLA fuses the whole stack into one executable; for deep homogeneous stacks
wrap layers in :class:`~normflows_tpu.core.flow.ScanChain`.
"""

from __future__ import annotations

import pickle
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module, static_field
from .flow import Flow, zero_log_det_like_z, _split_keys


def stop_gradient_tree(tree):
    return jax.tree.map(jax.lax.stop_gradient, tree)


class NormalizingFlow(Module):
    """Base-distribution + flow-chain (+ optional target) model (core.py:9-213).

    ``forward`` direction = latent -> data (sampling); ``inverse`` = data ->
    latent (density evaluation), matching flows/base.py conventions.
    """

    q0: Module
    flows: tuple
    p: Optional[Module] = None

    @classmethod
    def create(cls, q0, flows, p=None):
        return cls(q0=q0, flows=tuple(flows), p=p)

    # ---- transport -------------------------------------------------------
    def forward(self, z, context=None, *, key=None):
        """Latent -> data, dropping log-det (core.py:27-38)."""
        keys = _split_keys(key, len(self.flows))
        for flow, k in zip(self.flows, keys):
            z, _ = flow.forward(z, context, key=k)
        return z

    def forward_and_log_det(self, z, context=None, *, key=None):
        """core.py:40-55."""
        log_det = zero_log_det_like_z(z)
        keys = _split_keys(key, len(self.flows))
        for flow, k in zip(self.flows, keys):
            z, ld = flow.forward(z, context, key=k)
            log_det = log_det + ld
        return z, log_det

    def inverse(self, x, context=None, *, key=None):
        """Data -> latent (core.py:57-68)."""
        keys = _split_keys(key, len(self.flows))
        for flow, k in zip(reversed(self.flows), reversed(keys)):
            x, _ = flow.inverse(x, context, key=k)
        return x

    def inverse_and_log_det(self, x, context=None, *, key=None):
        """core.py:70-85."""
        log_det = zero_log_det_like_z(x)
        keys = _split_keys(key, len(self.flows))
        for flow, k in zip(reversed(self.flows), reversed(keys)):
            x, ld = flow.inverse(x, context, key=k)
            log_det = log_det + ld
        return x, log_det

    # ---- densities -------------------------------------------------------
    def log_prob(self, x, context=None, *, key=None):
        """core.py:182-197."""
        log_q = jnp.zeros(x.shape[0], x.dtype)
        z = x
        keys = _split_keys(key, len(self.flows))
        for flow, k in zip(reversed(self.flows), reversed(keys)):
            z, ld = flow.inverse(z, context, key=k)
            log_q = log_q + ld
        log_q = log_q + self.q0.log_prob(z, context)
        return log_q

    def sample(self, key, num_samples: int = 1, context=None):
        """core.py:167-180 — returns (z, log_q)."""
        kq, kf = jax.random.split(key)
        z, log_q = self.q0.sample_and_log_prob(kq, num_samples, context)
        keys = _split_keys(kf, len(self.flows))
        for flow, k in zip(self.flows, keys):
            z, ld = flow.forward(z, context, key=k)
            log_q = log_q - ld
        return z, log_q

    # distribution-protocol alias: a flow is usable wherever a base
    # distribution is (e.g. as an SMC/AIS proposal)
    def sample_and_log_prob(self, key, num_samples: int = 1, context=None):
        return self.sample(key, num_samples, context)

    # ---- training objectives --------------------------------------------
    def forward_kld(self, x, context=None, *, key=None):
        """-E_p[log q(x)] maximum-likelihood loss (core.py:87-102)."""
        return -jnp.mean(self.log_prob(x, context, key=key))

    def reverse_kld(
        self,
        key,
        num_samples: int = 1,
        context=None,
        beta: float = 1.0,
        score_fn: bool = True,
        z_sharding=None,
    ):
        """E_q[log q] - beta E_q[log p] (core.py:104-131).

        ``score_fn=False`` drops the score-function term (sticking-the-landing,
        Roeder et al 2017): log q is re-computed through a gradient-stopped
        copy of the model at the *sampled* z (core.py:121-129).

        ``z_sharding``: optional ``NamedSharding`` constraining the sampled
        batch axis — because reverse KLD *generates* its batch inside jit,
        nothing else pins the sample axis to the mesh; this annotation makes
        the whole step data-parallel (see parallel.make_reverse_kld_step).
        """
        kq, kf = jax.random.split(key)
        z, log_q_ = self.q0.sample_and_log_prob(kq, num_samples, context)
        if z_sharding is not None:
            z = jax.lax.with_sharding_constraint(z, z_sharding)
            log_q_ = jax.lax.with_sharding_constraint(
                log_q_,
                jax.sharding.NamedSharding(
                    z_sharding.mesh, jax.sharding.PartitionSpec(z_sharding.spec[0])
                ),
            )
        log_q = log_q_
        keys = _split_keys(kf, len(self.flows))
        for flow, k in zip(self.flows, keys):
            z, ld = flow.forward(z, context, key=k)
            log_q = log_q - ld
        if not score_fn:
            sg = stop_gradient_tree(self)
            z_ = z
            log_q = jnp.zeros(z_.shape[0], z_.dtype)
            # re-pass reuses the same per-layer keys so stochastic log-det
            # estimators see identical noise in both passes
            for flow, k in zip(reversed(sg.flows), reversed(keys)):
                z_, ld = flow.inverse(z_, context, key=k)
                log_q = log_q + ld
            log_q = log_q + sg.q0.log_prob(z_, context)
        log_p = self.p.log_prob(z) if context is None else self.p.log_prob(z, context)
        return jnp.mean(log_q) - beta * jnp.mean(log_p)

    def reverse_alpha_div(
        self, key, num_samples: int = 1, alpha: float = 1.0, dreg: bool = False,
        context=None,
    ):
        """Alpha-divergence loss (core.py:133-165), incl. DReG estimator."""
        kq, kf = jax.random.split(key)
        z, log_q = self.q0.sample_and_log_prob(kq, num_samples, context)
        keys = _split_keys(kf, len(self.flows))
        for flow, k in zip(self.flows, keys):
            z, ld = flow.forward(z, context, key=k)
            log_q = log_q - ld
        log_p = self.p.log_prob(z)
        if dreg:
            w_const = jax.lax.stop_gradient(jnp.exp(log_p - log_q))
            sg = stop_gradient_tree(self)
            z_ = z
            log_q = jnp.zeros(z_.shape[0], z_.dtype)
            for flow, k in zip(reversed(sg.flows), reversed(keys)):
                z_, ld = flow.inverse(z_, context, key=k)
                log_q = log_q + ld
            log_q = log_q + sg.q0.log_prob(z_, context)
            w = jnp.exp(log_p - log_q)
            w_alpha = w_const**alpha
            w_alpha = w_alpha / jnp.mean(w_alpha)
            weights = (1 - alpha) * w_alpha + alpha * w_alpha**2
            loss = -alpha * jnp.mean(weights * jnp.log(w))
        else:
            loss = np.sign(alpha - 1) * jax.scipy.special.logsumexp(
                alpha * (log_p - log_q)
            )
        return loss

    # ---- data-dependent init (ActNorm) ----------------------------------
    def init_actnorm(self, x, context=None):
        """Run one density-direction pass, initializing ActNorm layers.

        Functional replacement for the reference's lazy first-batch init
        (normalization.py:19-39; examples/residual.ipynb 'Initialize ActNorm').
        Returns the initialized model.
        """
        new_flows = []
        z = x
        for flow in reversed(self.flows):
            flow, z = flow.data_dep_init(z, context)
            new_flows.append(flow)
        return self.replace(flows=tuple(reversed(new_flows)))

    def init_actnorm_sampling(self, key, num_samples: int = 128, context=None):
        """Initialize ActNorm layers from a sampling-direction pass.

        The reference's lazy init fires on whichever direction runs first;
        reverse-KLD-trained models init by sampling (e.g. reference
        examples/augmented_flow.ipynb 'Initialize ActNorm' cell).  Returns
        the initialized model.
        """
        from .flow import _forward_data_dep_init

        z, _ = self.q0.sample_and_log_prob(key, num_samples, context)
        new_flows = []
        for flow in self.flows:
            flow, z = _forward_data_dep_init(flow, z, context)
            new_flows.append(flow)
        return self.replace(flows=tuple(new_flows))

    # ---- persistence (core.py:199-213) ----------------------------------
    def save(self, path: str):
        save_model(self, path)

    @classmethod
    def load(cls, path: str):
        return _load_as(cls, path)


class ConditionalNormalizingFlow(NormalizingFlow):
    """Flow with a conditioning context threaded through q0 and every layer
    (core.py:216-366).  The parent class already threads ``context``; this
    subclass exists for API parity and for target log-probs that consume the
    context (core.py:360-363)."""


def save_model(model, path: str):
    """Persist a model pytree: leaves as numpy arrays + treedef via pickle."""
    leaves, treedef = jax.tree.flatten(model)
    with open(path, "wb") as f:
        pickle.dump(
            {"leaves": [np.asarray(l) for l in leaves], "treedef": treedef}, f
        )


def load_model(path: str):
    with open(path, "rb") as f:
        data = pickle.load(f)
    return jax.tree.unflatten(data["treedef"], [jnp.asarray(l) for l in data["leaves"]])


def _load_as(cls, path: str):
    """load_model + type check: Facade.load(path) must not silently return a
    model of a different facade class pickled at ``path``."""
    obj = load_model(path)
    if not isinstance(obj, cls):
        raise TypeError(
            f"checkpoint at {path} contains {type(obj).__name__}, "
            f"not {cls.__name__}"
        )
    return obj


def load_params_like(model, path: str):
    """Load saved leaves into an existing model structure (state_dict-style).

    Mirrors the reference ``load_state_dict`` key checking (core.py:211-213):
    the checkpoint's pytree *structure* must match the model's exactly —
    equal leaf counts alone are not enough (two different architectures can
    coincidentally agree on leaf count and would load into garbage) — and so
    must every leaf's SHAPE (same class with different widths shares a
    treedef; torch's load_state_dict errors on size mismatch too).  Dtypes
    are converted, not checked, matching torch's ``copy_`` semantics — a
    float64 checkpoint loads into a float32 model."""
    with open(path, "rb") as f:
        data = pickle.load(f)
    leaves, treedef = jax.tree.flatten(model)
    saved_treedef = data["treedef"]
    if treedef != saved_treedef:
        # Name the first mismatching path for the error message.  The saved
        # treedef may not be reconstructable under CURRENT class definitions
        # (e.g. a field was added to a Module since the checkpoint was
        # written) — any failure here must not mask the structural error.
        detail = ""
        try:
            model_paths = [
                jax.tree_util.keystr(p)
                for p, _ in jax.tree_util.tree_flatten_with_path(model)[0]
            ]
            saved = jax.tree.unflatten(saved_treedef, data["leaves"])
            saved_paths = [
                jax.tree_util.keystr(p)
                for p, _ in jax.tree_util.tree_flatten_with_path(saved)[0]
            ]
            for i, (mp, sp) in enumerate(zip(model_paths, saved_paths)):
                if mp != sp:
                    detail = f"; first mismatching leaf path: model has {mp!r}, checkpoint has {sp!r} (leaf {i})"
                    break
            else:
                if len(model_paths) != len(saved_paths):
                    detail = (
                        f"; model has {len(model_paths)} leaves, checkpoint has "
                        f"{len(saved_paths)}"
                    )
                else:
                    detail = "; same leaf paths but different static structure (treedef mismatch)"
        except Exception as e:  # diagnostic only — never mask the real error
            detail = (
                "; additionally the checkpoint's structure could not be"
                f" rebuilt under current class definitions ({type(e).__name__})"
                " — it was likely saved by an older version of the model class"
            )
        raise ValueError(
            f"checkpoint at {path} does not match model structure{detail}"
        )
    for i, (p_leaf, saved_leaf) in enumerate(
        zip(jax.tree_util.tree_flatten_with_path(model)[0], data["leaves"])
    ):
        kp, leaf = p_leaf
        saved_arr = np.asarray(saved_leaf)
        if tuple(getattr(leaf, "shape", ())) != tuple(saved_arr.shape):
            raise ValueError(
                f"checkpoint at {path} leaf {jax.tree_util.keystr(kp)!r}"
                f" (leaf {i}) has shape {saved_arr.shape}, model expects"
                f" {getattr(leaf, 'shape', ())}"
            )
    # convert into each MODEL leaf's dtype (torch copy_ semantics): a bf16
    # model loaded from an f32 checkpoint must come back bf16, not silently
    # widen and change compiled-kernel dtypes downstream
    model_leaves = jax.tree.leaves(model)
    return jax.tree.unflatten(
        treedef,
        [
            jnp.asarray(l, dtype=getattr(ml, "dtype", None))
            for ml, l in zip(model_leaves, data["leaves"])
        ],
    )


class ClassCondFlow(Module):
    """Class label conditions only the base distribution (core.py:369-452)."""

    q0: Module
    flows: tuple

    @classmethod
    def create(cls, q0, flows):
        return cls(q0=q0, flows=tuple(flows))

    def forward_kld(self, x, y, *, key=None):
        """core.py:387-402."""
        log_q = jnp.zeros(x.shape[0], x.dtype)
        z = x
        for flow in reversed(self.flows):
            z, ld = flow.inverse(z)
            log_q = log_q + ld
        log_q = log_q + self.q0.log_prob(z, y)
        return -jnp.mean(log_q)

    def sample(self, key, num_samples: int = 1, y=None):
        """core.py:404-418 — (z, log_q)."""
        kq, kf = jax.random.split(key)
        z, log_q = self.q0.sample_and_log_prob(kq, num_samples, y)
        for flow in self.flows:
            z, ld = flow.forward(z)
            log_q = log_q - ld
        return z, log_q

    def log_prob(self, x, y):
        """core.py:420-436."""
        log_q = jnp.zeros(x.shape[0], x.dtype)
        z = x
        for flow in reversed(self.flows):
            z, ld = flow.inverse(z)
            log_q = log_q + ld
        log_q = log_q + self.q0.log_prob(z, y)
        return log_q

    def save(self, path: str):
        """core.py:438-445."""
        save_model(self, path)

    @classmethod
    def load(cls, path: str):
        """core.py:446-452."""
        return _load_as(cls, path)


class MultiscaleFlow(Module):
    """RealNVP/Glow multi-scale architecture (core.py:455-653).

    ``q0``: per-level base distributions (level 0 innermost);
    ``flows``: per-level flow lists; ``merges``: Merge/Split flows between
    levels; ``transform``: optional data-space preprocessing flow (Logit);
    ``class_cond``: whether bases consume a class label.
    """

    q0: tuple
    flows: tuple  # tuple of tuples
    merges: tuple
    transform: Optional[Module] = None
    class_cond: bool = static_field(default=True)

    @classmethod
    def create(cls, q0, flows, merges, transform=None, class_cond=True):
        return cls(
            q0=tuple(q0),
            flows=tuple(tuple(f) for f in flows),
            merges=tuple(merges),
            transform=transform,
            class_cond=class_cond,
        )

    @property
    def num_levels(self):
        return len(self.q0)

    def forward_kld(self, x, y=None, *, key=None):
        """core.py:480-490."""
        return -jnp.mean(self.log_prob(x, y))

    def forward(self, x, y=None):
        """Negative log-likelihood (core.py:492-502)."""
        return -self.log_prob(x, y)

    def forward_and_log_det(self, z_list):
        """Latent list -> data (core.py:504-526)."""
        log_det = jnp.zeros(z_list[0].shape[0], z_list[0].dtype)
        z = None
        for i in range(self.num_levels):
            if i == 0:
                z = z_list[0]
            else:
                z, ld = self.merges[i - 1].forward([z, z_list[i]])
                log_det = log_det + ld
            for flow in self.flows[i]:
                z, ld = flow.forward(z)
                log_det = log_det + ld
        if self.transform is not None:
            z, ld = self.transform.forward(z)
            log_det = log_det + ld
        return z, log_det

    def inverse_and_log_det(self, x):
        """Data -> latent list (core.py:528-551)."""
        log_det = jnp.zeros(x.shape[0], x.dtype)
        if self.transform is not None:
            x, ld = self.transform.inverse(x)
            log_det = log_det + ld
        z_list = []
        z = x
        for i in range(self.num_levels - 1, -1, -1):
            for flow in reversed(self.flows[i]):
                z, ld = flow.inverse(z)
                log_det = log_det + ld
            if i > 0:
                (z, z_i), ld = self.merges[i - 1].inverse(z)
                log_det = log_det + ld
                z_list.append(z_i)
            else:
                z_list.append(z)
        return list(reversed(z_list)), log_det

    def sample(self, key, num_samples: int = 1, y=None, temperature=None):
        """core.py:553-586 — (x, log_q).  Temperature applied functionally."""
        model = self.set_temperature(temperature) if temperature is not None else self
        keys = jax.random.split(key, model.num_levels + 1)
        if model.class_cond and y is None:
            nc = _num_classes_of(model.q0[0])
            y = jax.random.randint(keys[-1], (num_samples,), 0, nc)
        z = None
        log_q = 0.0
        for i in range(model.num_levels):
            ctx = y if model.class_cond else None
            z_, log_q_ = model.q0[i].sample_and_log_prob(keys[i], num_samples, ctx)
            log_q = log_q + log_q_
            if i == 0:
                z = z_
            else:
                z, ld = model.merges[i - 1].forward([z, z_])
                log_q = log_q - ld
            for flow in model.flows[i]:
                z, ld = flow.forward(z)
                log_q = log_q - ld
        if model.transform is not None:
            z, ld = model.transform.forward(z)
            log_q = log_q - ld
        return z, log_q

    def log_prob(self, x, y=None):
        """core.py:588-616."""
        log_q = jnp.zeros(x.shape[0], x.dtype)
        z = x
        if self.transform is not None:
            z, ld = self.transform.inverse(z)
            log_q = log_q + ld
        for i in range(self.num_levels - 1, -1, -1):
            for flow in reversed(self.flows[i]):
                z, ld = flow.inverse(z)
                log_q = log_q + ld
            if i > 0:
                (z, z_i), ld = self.merges[i - 1].inverse(z)
                log_q = log_q + ld
            else:
                z_i = z
            ctx = y if self.class_cond else None
            log_q = log_q + self.q0[i].log_prob(z_i, ctx)
        return log_q

    def set_temperature(self, temperature):
        """core.py:634-646 — functional: returns a new model."""
        new_q0 = []
        for q in self.q0:
            if hasattr(q, "temperature"):
                new_q0.append(q.replace(temperature=temperature))
            else:
                raise NotImplementedError(
                    "One base distribution does not support temperature annealing"
                )
        return self.replace(q0=tuple(new_q0))

    def reset_temperature(self):
        """core.py:648-653."""
        return self.set_temperature(None)

    def init_actnorm(self, x, y=None):
        """Data-dependent init over all levels (density direction)."""
        z = x
        if self.transform is not None:
            z, _ = self.transform.inverse(z)
        new_flows = list(list(f) for f in self.flows)
        for i in range(self.num_levels - 1, -1, -1):
            for j in range(len(self.flows[i]) - 1, -1, -1):
                flow, z = self.flows[i][j].data_dep_init(z)
                new_flows[i][j] = flow
            if i > 0:
                (z, _), _ = self.merges[i - 1].inverse(z)
        return self.replace(flows=tuple(tuple(f) for f in new_flows))

    def save(self, path: str):
        """core.py:618-625."""
        save_model(self, path)

    @classmethod
    def load(cls, path: str):
        """core.py:626-632."""
        return _load_as(cls, path)


def _num_classes_of(q0):
    nc = getattr(q0, "num_classes", None)
    if nc is None:
        raise ValueError("class-conditional sampling requires q0.num_classes")
    return nc


class NormalizingFlowVAE(Module):
    """VAE with flow-transformed posterior (core.py:656-700)."""

    prior: Module
    decoder: Optional[Module]
    flows: tuple
    q0: Module

    @classmethod
    def create(cls, prior, q0, flows, decoder=None):
        return cls(prior=prior, decoder=decoder, flows=tuple(flows), q0=q0)

    def __call__(self, key, x, num_samples: int = 1):
        """Returns (z, log_q, log_p) with shape (batch, num_samples, ...)."""
        z, log_q = self.q0.sample_and_log_prob(key, x, num_samples=num_samples)
        # Flatten (B, S, ...) -> (B*S, ...) as core.py:688-689
        batch, S = z.shape[0], z.shape[1]
        z = z.reshape(-1, *z.shape[2:])
        log_q = log_q.reshape(-1)
        log_det = jnp.zeros(z.shape[0], z.dtype)
        for flow in self.flows:
            z, ld = flow.forward(z)
            log_det = log_det + ld
        log_q = log_q - log_det
        log_p = self.prior.log_prob(z)
        if self.decoder is not None:
            x_tiled = jnp.repeat(x[:, None], S, axis=1).reshape(-1, *x.shape[1:])
            log_p = log_p + self.decoder.log_prob(x_tiled, z)
        z = z.reshape(batch, S, *z.shape[1:])
        log_q = log_q.reshape(batch, S)
        log_p = log_p.reshape(batch, S)
        return z, log_q, log_p
