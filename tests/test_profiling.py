"""Profiling / cost-reporting subsystem (SURVEY.md §5: new observability
tier replacing the reference's tqdm-only notebooks)."""

import time

import jax
import jax.numpy as jnp

from normflows_tpu.utils import profiling


def test_annotate_preserves_semantics():
    @profiling.annotate("double")
    def f(x):
        return 2 * x

    assert f.__name__ == "f"
    out = jax.jit(f)(jnp.arange(4.0))
    assert jnp.allclose(out, jnp.array([0.0, 2.0, 4.0, 6.0]))


def test_trace_context_runs():
    with profiling.trace("block"):
        x = jnp.ones((8,)) + 1
    assert float(x.sum()) == 16.0


def test_cost_report_matmul():
    a = jnp.ones((64, 64))
    rep = profiling.cost_report(lambda x: x @ x, a)
    # 64^3 MACs => 2*64^3 flops (XLA counts fused multiply-add as 2)
    assert rep["flops"] >= 64**3
    assert rep["bytes_accessed"] > 0
    assert rep["arithmetic_intensity"] > 0


def test_scan_flops_counted_once():
    """Regression for the round-2 bench.py MFU bug: XLA ``cost_analysis()``
    counts a ``lax.scan`` body ONCE, not trip-count times.  Per-step FLOP
    accounting must therefore come from a single-step executable (as bench.py
    now does), never from ``chunk_flops / chunk_len``."""
    a = jnp.ones((128, 128))

    def one(x):
        return x @ a

    def scanned(x):
        x, _ = jax.lax.scan(lambda c, _: (one(c), None), x, None, length=10)
        return x

    def flops(fn):
        compiled = jax.jit(fn).lower(a).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else (ca or {})
        return float(ca.get("flops", 0.0))

    f_one, f_scan = flops(one), flops(scanned)
    assert f_one > 0
    # The documented XLA behavior this accounting must respect: the 10-step
    # scan reports ~1x the body's flops (NOT ~10x).  If XLA ever starts
    # multiplying by trip count this assert flags it so bench.py can revert.
    assert f_scan < 2.0 * f_one, (f_one, f_scan)
    # Correct per-step accounting = single-step executable's flops.
    per_step_correct = f_one
    per_step_buggy = f_scan / 10
    assert per_step_correct > 5 * per_step_buggy


def test_benchmark_reports_rate():
    f = jax.jit(lambda x: (x * 2).sum())
    x = jnp.ones((128,))
    res = profiling.benchmark(f, x, iters=5, warmup=1, items_per_call=128)
    assert res["ms_per_iter"] > 0
    assert res["items_per_sec"] > 0


def test_meter_rate_and_history():
    m = profiling.Meter(window=10)
    for i in range(5):
        m.update(num_items=100, loss=float(i))
        time.sleep(0.001)
    assert m.steps == 5
    assert m.rate > 0
    assert m.last("loss") == 4.0
    assert m.mean("loss") == 2.0
    assert m.mean("loss", last_n=2) == 3.5
