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
