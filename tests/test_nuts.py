"""NUTS: bit-trick bookkeeping vs brute force, statistical correctness,
divergence detection, and NeuTra integration (sampling/nuts.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import normflows_tpu as nft
from normflows_tpu import distributions
from normflows_tpu.sampling import NUTS
from normflows_tpu.sampling.nuts import ckpt_slot_range, trailing_ones
from tests.helpers import assert_close


class TestCheckpointArithmetic:
    """The binary-counter checkpoint scheme must reproduce the recursive
    tree's U-turn comparisons exactly: odd leaf i completes one block per
    trailing 1-bit, and each block's start leaf must sit at the slot the
    range formula points to."""

    def test_slot_range_matches_bruteforce(self):
        for i in range(1, 256):
            t = int(trailing_ones(jnp.int32(i)))
            # brute force: blocks of size 2^k ending at i
            expect_starts = [
                i - 2**k + 1 for k in range(1, 20) if (i + 1) % 2**k == 0
            ]
            assert t == len(expect_starts)
            if i % 2 == 0:
                lo, hi = ckpt_slot_range(jnp.int32(i))
                assert int(hi) < int(lo)  # empty range on even leaves
                continue
            lo, hi = int(ckpt_slot_range(jnp.int32(i))[0]), int(
                ckpt_slot_range(jnp.int32(i))[1])
            assert hi - lo + 1 == len(expect_starts)
            # each start leaf s is even and was stored at slot popcount(s);
            # the formula's contiguous range must hit exactly those slots
            got_slots = sorted(bin(s).count("1") for s in expect_starts)
            assert got_slots == list(range(lo, hi + 1))

    def test_checkpoint_slots_never_clobbered_while_live(self):
        """A checkpoint stored at even leaf j must survive until the last
        block it starts is closed."""
        max_leaves = 256
        for j in range(0, max_leaves, 2):
            slot = bin(j).count("1")
            # blocks started at j: sizes 2^k for k=1..trailing_zeros(j)
            # (j=0 starts every block)
            ks = []
            k = 1
            while (j % 2**k == 0 or j == 0) and 2**k <= max_leaves:
                if j % 2**k == 0:
                    ks.append(k)
                k += 1
            if not ks:
                continue
            last_close = j + 2 ** max(ks) - 1
            # no later even leaf before last_close may reuse the slot
            for j2 in range(j + 2, last_close + 1, 2):
                assert bin(j2).count("1") != slot, (j, j2, slot)


def _run_nuts(target, dim, key, num_chains=32, num_steps=300, num_adapt=80,
              step_size=0.2, max_depth=6):
    nuts = NUTS.create(target, dim, step_size=step_size, max_depth=max_depth)
    zs, info = jax.jit(
        lambda k: nuts.sample(k, num_chains, num_steps, num_adapt=num_adapt)
    )(key)
    return np.asarray(zs).reshape(-1, dim), info


class TestStatistical:
    def test_correlated_gaussian_moments(self):
        """NUTS must recover mean and covariance of a correlated Gaussian."""
        loc = jnp.array([1.0, -2.0])
        cov = jnp.array([[1.0, 0.8], [0.8, 2.0]])
        prec = jnp.linalg.inv(cov)

        class Target:
            def log_prob(self, z):
                d = z - loc
                return -0.5 * jnp.einsum("bi,ij,bj->b", d, prec, d)

        xs, info = _run_nuts(Target(), 2, jax.random.key(0))
        assert float(info["divergence_rate"]) < 0.02
        assert_close(xs.mean(0), np.asarray(loc), atol=0.15, rtol=0.1)
        assert_close(np.cov(xs.T), np.asarray(cov), atol=0.35, rtol=0.2)

    def test_adaptation_reaches_reasonable_acceptance(self):
        target = distributions.DiagGaussian.create(4)
        nuts = NUTS.create(target, 4, step_size=1.5, max_depth=6)
        zs, info = jax.jit(
            lambda k: nuts.sample(k, 16, 100, num_adapt=100)
        )(jax.random.key(1))
        acc = float(jnp.mean(info["accept_prob"]))
        assert 0.6 < acc <= 1.0
        assert zs.shape == (100, 16, 4)

    def test_mass_adaptation_learns_scales(self):
        """On a strongly anisotropic Gaussian the Welford warmup must set
        inv_mass close to the per-dim variances and recover the stds."""
        scales = jnp.array([0.25, 4.0])

        class Aniso:
            def log_prob(self, z):
                return -0.5 * jnp.sum((z / scales) ** 2, -1)

        nuts = NUTS.create(Aniso(), 2, step_size=0.3, max_depth=7)
        zs, info = jax.jit(
            lambda k: nuts.sample(k, 32, 300, num_adapt=200)
        )(jax.random.key(7))
        inv_mass = np.asarray(info["inv_mass"])
        # adapted inv_mass ≈ posterior variance (0.0625, 16) within 2x
        assert 0.5 < inv_mass[0] / 0.0625 < 2.0
        assert 0.5 < inv_mass[1] / 16.0 < 2.0
        x = np.asarray(zs).reshape(-1, 2)
        assert_close(x.std(0), np.asarray(scales), atol=0.0, rtol=0.15)
        assert float(info["divergence_rate"]) < 0.02

    def test_depth_bounded_and_stats_finite(self):
        target = distributions.DiagGaussian.create(3)
        nuts = NUTS.create(target, 3, step_size=0.5, max_depth=4)
        z = jax.random.normal(jax.random.key(2), (8, 3))
        z2, stats = jax.jit(nuts.transition)(jax.random.key(3), z)
        assert z2.shape == z.shape
        assert int(jnp.max(stats["depth"])) <= 4
        assert bool(jnp.all(stats["accept_prob"] >= 0))
        assert bool(jnp.all(stats["accept_prob"] <= 1))


class TestDivergence:
    def test_huge_step_size_flags_divergence(self):
        """An enormous step on a narrow Gaussian must blow up the energy and
        be flagged, leaving the chain at its starting point."""

        class Narrow:
            def log_prob(self, z):
                return -0.5 * jnp.sum((z * 100.0) ** 2, -1)

        nuts = NUTS.create(Narrow(), 2, step_size=50.0, max_depth=5)
        z = jnp.full((4, 2), 0.01)
        z2, stats = jax.jit(nuts.transition)(jax.random.key(4), z)
        assert bool(jnp.all(stats["diverging"]))
        assert_close(z2, z, atol=1e-6, rtol=0)


class TestNeuTra:
    def test_nuts_on_pullback_target(self):
        """NeuTra-NUTS: sampling the pullback of a shifted Gaussian through a
        trained-free affine flow recovers the data-space target."""
        from normflows_tpu import flows
        from normflows_tpu.sampling import PullbackTarget

        base = distributions.DiagGaussian.create(2)
        shift = flows.AffineConstFlow.create((2,)).replace(
            t=jnp.array([[3.0, -1.0]]))
        model = nft.NormalizingFlow.create(
            base, [shift],
            p=distributions.DiagGaussian.create(2).replace(
                loc=jnp.array([[3.0, -1.0]])),
        )
        pullback = PullbackTarget(flow_model=model)
        nuts = NUTS.create(pullback, 2, step_size=0.5, max_depth=6)
        us, info = jax.jit(
            lambda k: nuts.sample(k, 16, 200, num_adapt=50)
        )(jax.random.key(5))
        # pullback of the matched target is standard normal in latent space
        u = np.asarray(us).reshape(-1, 2)
        assert_close(u.mean(0), np.zeros(2), atol=0.15, rtol=0)
        assert_close(u.std(0), np.ones(2), atol=0.15, rtol=0)
