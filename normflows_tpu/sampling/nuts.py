"""No-U-Turn Sampler (NUTS), TPU-native iterative formulation.

Completes the flow-preconditioned HMC/NUTS extension (SURVEY.md §7 item 8;
the reference has neither — its stochastic tier stops at fixed-step HMC,
normflows/flows/stochastic.py:52-109).  Point ``target`` at a
:class:`~normflows_tpu.sampling.neutra.PullbackTarget` to get NeuTra-NUTS.

The classic recursive tree doubling (Hoffman & Gelman 2014) cannot compile
under XLA.  This is the ITERATIVE multinomial variant (Betancourt 2017's
multinomial weights + generalized U-turn criterion; iterative subtree
construction after Phan & Pradhan's formulation): one chain is a pair of
``lax.while_loop``s with O(max_depth) checkpoint stacks — static shapes,
no recursion — and chains vectorize with ``vmap`` (the while-loop batching
rule masks finished lanes, so all chains advance in lockstep on the TPU).

U-turn bookkeeping inside a subtree uses the binary-counter checkpoint
trick: leaf ``j`` (0-indexed, even) opens blocks and is stored at stack slot
``popcount(j)``; arriving at odd leaf ``i`` completes the blocks ending at
``i`` whose start states sit at the contiguous slot range
``[popcount(i+1)-1, popcount(i+1)-1 + trailing_ones(i) - 1]`` (validated
against brute force in tests/test_nuts.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.module import Module, buffer_field, static_field


# --------------------------------------------------------------------------
# checkpoint-slot arithmetic (int32 bit tricks; pure functions of leaf index)
# --------------------------------------------------------------------------

def trailing_ones(i):
    """Number of trailing 1-bits of ``i`` (= size class of blocks ending at i)."""
    n = i + 1
    return jax.lax.population_count((n & -n) - 1)


def ckpt_slot_range(i):
    """(idx_min, idx_max) of checkpoint slots holding the start states of all
    blocks completed by odd leaf ``i``; empty (idx_max < idx_min) for even i."""
    idx_min = jax.lax.population_count(i + 1) - 1
    idx_max = idx_min + trailing_ones(i) - 1
    return idx_min, idx_max


class _TreeState(NamedTuple):
    key: jax.Array
    z_left: jax.Array
    p_left: jax.Array
    z_right: jax.Array
    p_right: jax.Array
    z_prop: jax.Array
    log_w: jax.Array
    p_sum: jax.Array
    depth: jax.Array
    turning: jax.Array
    diverging: jax.Array
    acc_sum: jax.Array
    acc_cnt: jax.Array


class NUTS(Module):
    """Multinomial No-U-Turn sampler over a batched-log-prob target.

    ``target.log_prob`` must accept ``(batch, dim)``; ``step_size`` is a
    scalar buffer (tune with :meth:`sample`'s dual-averaging warmup);
    ``inv_mass`` is the diagonal inverse mass matrix.
    """

    target: Module
    step_size: jnp.ndarray = buffer_field()
    inv_mass: jnp.ndarray = buffer_field()
    max_depth: int = static_field(default=8)
    max_delta_energy: float = static_field(default=1000.0)

    @classmethod
    def create(cls, target, dim: int, step_size: float = 0.1,
               inv_mass=None, max_depth: int = 8):
        inv_mass = jnp.ones(dim) if inv_mass is None else jnp.asarray(inv_mass)
        return cls(target=target, step_size=jnp.asarray(step_size, jnp.float32),
                   inv_mass=inv_mass, max_depth=max_depth)

    # -- single-chain pieces (vmapped in transition) ------------------------

    def _log_prob_one(self, z):
        return self.target.log_prob(z[None])[0]

    def _energy(self, z, p):
        return -self._log_prob_one(z) + 0.5 * jnp.sum(p * p * self.inv_mass)

    def _leapfrog(self, z, p, eps):
        grad = jax.grad(self._log_prob_one)
        p = p + 0.5 * eps * grad(z)
        z = z + eps * p * self.inv_mass
        p = p + 0.5 * eps * grad(z)
        return z, p

    def _is_turning(self, r_left, r_right, r_sum):
        """Generalized U-turn criterion (Betancourt 2017, app. A.4.2)."""
        r_c = r_sum - 0.5 * (r_left + r_right)
        at_left = jnp.dot(r_left * self.inv_mass, r_c) <= 0.0
        at_right = jnp.dot(r_right * self.inv_mass, r_c) <= 0.0
        return at_left | at_right

    def _build_subtree(self, key, z, p, eps_signed, num_leaves, energy0):
        """Iteratively extend ``num_leaves`` leapfrog steps from (z, p).

        Returns end state, multinomial proposal + log-weight, momentum sum,
        turning/diverging flags, and acceptance-statistic accumulators.
        """
        dim = z.shape[0]
        zeros_stack = jnp.zeros((self.max_depth, dim), z.dtype)

        def cond(c):
            return (c["i"] < num_leaves) & ~c["turning"] & ~c["diverging"]

        def body(c):
            key, k_take = jax.random.split(c["key"])
            i = c["i"]
            z_new, p_new = self._leapfrog(c["z"], c["p"], eps_signed)
            delta = self._energy(z_new, p_new) - energy0
            delta = jnp.where(jnp.isfinite(delta), delta, jnp.inf)
            diverging = delta > self.max_delta_energy

            # progressive multinomial proposal within the subtree
            log_w_leaf = -delta
            log_w_new = jnp.logaddexp(c["log_w"], log_w_leaf)
            take = (
                jnp.log(jax.random.uniform(k_take, (), z.dtype))
                < log_w_leaf - log_w_new
            )
            z_prop = jnp.where(take, z_new, c["z_prop"])

            # even leaves open blocks: checkpoint momentum + cumsum-before
            slot = jax.lax.population_count(i)
            is_even = (i % 2) == 0
            r_ckpts = jnp.where(
                is_even, c["r_ckpts"].at[slot].set(p_new), c["r_ckpts"])
            rsum_ckpts = jnp.where(
                is_even, c["rsum_ckpts"].at[slot].set(c["p_cumsum"]),
                c["rsum_ckpts"])
            p_cumsum = c["p_cumsum"] + p_new

            # odd leaves close blocks: U-turn check against every completed
            # block's start checkpoint (contiguous slot range; see module doc)
            idx_min, idx_max = ckpt_slot_range(i)

            def check(s, turning):
                active = (s >= idx_min) & (s <= idx_max)
                r_l = r_ckpts[s]
                block_sum = p_cumsum - rsum_ckpts[s]
                t = self._is_turning(r_l, p_new, block_sum)
                return turning | (active & t)

            turning = jax.lax.fori_loop(
                0, self.max_depth, check, jnp.asarray(False))

            return {
                "key": key, "i": i + 1, "z": z_new, "p": p_new,
                "z_prop": z_prop, "log_w": log_w_new, "p_cumsum": p_cumsum,
                "r_ckpts": r_ckpts, "rsum_ckpts": rsum_ckpts,
                "turning": turning, "diverging": diverging,
                "acc_sum": c["acc_sum"] + jnp.minimum(1.0, jnp.exp(-delta)),
                "acc_cnt": c["acc_cnt"] + 1,
            }

        init = {
            "key": key, "i": jnp.asarray(0, jnp.int32), "z": z, "p": p,
            "z_prop": z, "log_w": jnp.asarray(-jnp.inf, z.dtype),
            "p_cumsum": jnp.zeros_like(p),
            "r_ckpts": zeros_stack, "rsum_ckpts": zeros_stack,
            "turning": jnp.asarray(False), "diverging": jnp.asarray(False),
            "acc_sum": jnp.asarray(0.0, z.dtype),
            "acc_cnt": jnp.asarray(0, jnp.int32),
        }
        return jax.lax.while_loop(cond, body, init)

    def _transition_one(self, key, z, step_size):
        """One NUTS transition for a single chain state ``z`` of shape (dim,)."""
        k_mom, k_loop = jax.random.split(key)
        p0 = jax.random.normal(k_mom, z.shape, z.dtype) / jnp.sqrt(self.inv_mass)
        energy0 = self._energy(z, p0)

        state = _TreeState(
            key=k_loop, z_left=z, p_left=p0, z_right=z, p_right=p0,
            z_prop=z, log_w=jnp.asarray(0.0, z.dtype), p_sum=p0,
            depth=jnp.asarray(0, jnp.int32), turning=jnp.asarray(False),
            diverging=jnp.asarray(False), acc_sum=jnp.asarray(0.0, z.dtype),
            acc_cnt=jnp.asarray(0, jnp.int32),
        )

        def cond(s):
            return (s.depth < self.max_depth) & ~s.turning & ~s.diverging

        def body(s):
            key, k_dir, k_sub, k_acc = jax.random.split(s.key, 4)
            going_right = jax.random.bernoulli(k_dir)
            z0 = jnp.where(going_right, s.z_right, s.z_left)
            p0e = jnp.where(going_right, s.p_right, s.p_left)
            eps = step_size * jnp.where(going_right, 1.0, -1.0)

            sub = self._build_subtree(
                k_sub, z0, p0e, eps, jnp.int32(1) << s.depth, energy0)
            valid = ~sub["turning"] & ~sub["diverging"]

            # biased progressive sampling across subtrees (favors the new one)
            accept_new = (
                jnp.log(jax.random.uniform(k_acc, (), z.dtype))
                < sub["log_w"] - s.log_w
            )
            z_prop = jnp.where(valid & accept_new, sub["z_prop"], s.z_prop)
            log_w = jnp.where(valid, jnp.logaddexp(s.log_w, sub["log_w"]),
                              s.log_w)
            z_left = jnp.where(valid & ~going_right, sub["z"], s.z_left)
            p_left = jnp.where(valid & ~going_right, sub["p"], s.p_left)
            z_right = jnp.where(valid & going_right, sub["z"], s.z_right)
            p_right = jnp.where(valid & going_right, sub["p"], s.p_right)
            p_sum = jnp.where(valid, s.p_sum + sub["p_cumsum"], s.p_sum)
            turning_top = valid & self._is_turning(p_left, p_right, p_sum)

            return _TreeState(
                key=key, z_left=z_left, p_left=p_left, z_right=z_right,
                p_right=p_right, z_prop=z_prop, log_w=log_w, p_sum=p_sum,
                depth=s.depth + 1, turning=sub["turning"] | turning_top,
                diverging=sub["diverging"],
                acc_sum=s.acc_sum + sub["acc_sum"],
                acc_cnt=s.acc_cnt + sub["acc_cnt"],
            )

        out = jax.lax.while_loop(cond, body, state)
        accept_prob = out.acc_sum / jnp.maximum(out.acc_cnt, 1)
        stats = {
            "accept_prob": accept_prob,
            "depth": out.depth,
            "diverging": out.diverging,
            "num_leapfrog": out.acc_cnt,
        }
        return out.z_prop, stats

    # -- batched API ---------------------------------------------------------

    def transition(self, key, z, step_size=None):
        """One NUTS step for ``z`` of shape (chains, dim) -> (z_new, stats)."""
        step_size = self.step_size if step_size is None else step_size
        keys = jax.random.split(key, z.shape[0])
        return jax.vmap(
            lambda k, zz: self._transition_one(k, zz, step_size)
        )(keys, z)

    def sample(self, key, num_chains: int, num_steps: int,
               initial=None, num_adapt: int = 100, target_accept: float = 0.8,
               adapt_mass: bool = True):
        """Run warmup (dual-averaging step size + optional diagonal mass
        estimation, Stan-style two-phase) + sampling.

        Returns ``(samples (num_steps, num_chains, dim), info)``; the chain
        axis is shardable over a mesh (parallel/chains.py conventions).
        """
        from .adaptation import dual_averaging_init, dual_averaging_update

        dim = self.inv_mass.shape[0]
        k_init, k_a, k_b, k_run = jax.random.split(key, 4)
        z = (jnp.asarray(initial) if initial is not None
             else jax.random.normal(k_init, (num_chains, dim)))

        sampler = self
        da = dual_averaging_init(self.step_size)
        stats0 = (jnp.zeros(()), jnp.zeros(dim), jnp.zeros(dim))

        def warm_phase(sampler, z, da, key, n_steps):
            def body(carry, step_key):
                z, da, (n, sm, s2) = carry
                z, tr = sampler.transition(step_key, z, jnp.exp(da.log_step))
                da = dual_averaging_update(
                    da, jnp.mean(tr["accept_prob"]), target=target_accept)
                moments = (n + z.shape[0], sm + z.sum(0), s2 + (z * z).sum(0))
                return (z, da, moments), None

            (z, da, moments), _ = jax.lax.scan(
                body, (z, da, stats0), jax.random.split(key, n_steps))
            return z, da, moments

        if num_adapt > 0 and adapt_mass:
            n_a = max(1, num_adapt // 2)
            z, da, (n, sm, s2) = warm_phase(sampler, z, da, k_a, n_a)
            mean = sm / n
            var = jnp.maximum(s2 / n - mean * mean, 1e-6)
            # Stan's regularization toward unit mass for short windows
            var = n / (n + 5.0) * var + 1e-3 * (5.0 / (n + 5.0))
            sampler = sampler.replace(inv_mass=var)
            da = dual_averaging_init(jnp.exp(da.log_step_avg))
            z, da, _ = warm_phase(
                sampler, z, da, k_b, max(1, num_adapt - n_a))
        elif num_adapt > 0:
            z, da, _ = warm_phase(sampler, z, da, k_a, num_adapt)
        step_size = jnp.exp(da.log_step_avg)

        def run_body(z, step_key):
            z, stats = sampler.transition(step_key, z, step_size)
            return z, (z, stats)

        _, (zs, stats) = jax.lax.scan(
            run_body, z, jax.random.split(k_run, num_steps))
        info = {
            "step_size": step_size,
            "inv_mass": sampler.inv_mass,
            "accept_prob": stats["accept_prob"],
            "mean_depth": jnp.mean(stats["depth"].astype(jnp.float32)),
            "divergence_rate": jnp.mean(
                stats["diverging"].astype(jnp.float32)),
        }
        return zs, info
