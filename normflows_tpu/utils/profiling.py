"""Tracing / profiling / cost reporting.

The reference has no observability beyond notebook ``tqdm`` bars (SURVEY.md
§5: "Tracing / profiling: none").  This module is the TPU-native subsystem
that replaces it:

* :func:`trace` / :func:`annotate` — ``jax.profiler`` trace annotations so
  framework phases show up as named spans in the TensorBoard / Perfetto
  profile alongside the XLA kernels.
* :func:`start_trace` / :func:`stop_trace` — capture a device trace to a
  log directory.
* :func:`cost_report` — per-program FLOPs / memory-traffic estimates from the
  compiled XLA executable (``cost_analysis``), plus arithmetic intensity.
* :func:`benchmark` — wall-clock timing of a jitted callable with proper
  ``block_until_ready`` fencing; returns ms/iter and optional items/s.
* :class:`Meter` — lightweight streaming samples/s + loss meter for training
  loops (the BASELINE metric is samples/s/chip).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Mapping, Optional

import jax


# --------------------------------------------------------------------------
# Trace annotations
# --------------------------------------------------------------------------

def trace(name: str, **kwargs):
    """Context manager: annotate the enclosed host block in the device trace.

    Usage::

        with profiling.trace("hais_ladder"):
            samples, log_w = hais.sample(key, n)
    """
    return jax.profiler.TraceAnnotation(name, **kwargs)


def step_trace(name: str, step_num: Optional[int] = None):
    """Per-step annotation; TensorBoard groups spans by ``step_num``."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step_num)


def annotate(name: Optional[str] = None) -> Callable:
    """Decorator: wrap ``fn`` in a trace annotation + XLA ``named_scope``.

    The named scope propagates into HLO metadata, so the annotated region is
    attributable in compiled-kernel profiles too (not only host-side spans).
    """

    def deco(fn: Callable) -> Callable:
        label = name or getattr(fn, "__name__", "fn")

        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(label), jax.named_scope(label):
                return fn(*args, **kwargs)

        wrapped.__name__ = getattr(fn, "__name__", label)
        wrapped.__doc__ = fn.__doc__
        return wrapped

    return deco


def start_trace(logdir: str, **kwargs) -> None:
    """Begin capturing a profiler trace (host + device) to ``logdir``."""
    jax.profiler.start_trace(logdir, **kwargs)


def stop_trace() -> None:
    jax.profiler.stop_trace()


@contextlib.contextmanager
def capture(logdir: str, **kwargs):
    """``with capture("/tmp/trace"): step(...)`` — scoped start/stop_trace."""
    jax.profiler.start_trace(logdir, **kwargs)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# --------------------------------------------------------------------------
# Compiled-program cost reporting
# --------------------------------------------------------------------------

# Dense bf16 matmul peak FLOP/s per chip (all cores), by device_kind substring
# (order matters: first match wins).
PEAK_BF16_FLOPS = (
    ("v6", 918e12),       # Trillium / v6e
    ("v5p", 459e12),
    ("v5", 197e12),       # v5e / "TPU v5 lite"
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def chip_peak_flops(device=None) -> float:
    """Dense-bf16 peak FLOP/s for ``device`` (default: first local device).

    Returns NaN for unknown kinds (e.g. CPU) so MFU ratios propagate NaN
    instead of silently reporting against the wrong peak.
    """
    device = device if device is not None else jax.devices()[0]
    kind = device.device_kind.lower()
    for tag, peak in PEAK_BF16_FLOPS:
        if tag in kind:
            return peak
    return float("nan")

def executable_cost(compiled) -> Mapping[str, Any]:
    """Unwrap ``compiled.cost_analysis()`` across jax versions.

    Some jaxlib versions return a per-partition list, others a bare mapping
    or None; every FLOP/bytes consumer must use this one shim (bench.py and
    the benchmark examples included) so a future format change is fixed in
    one place.
    """
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return ca or {}


def cost_report(fn: Callable, *args, **kwargs) -> Mapping[str, Any]:
    """Compile ``fn(*args)`` and report XLA's static cost analysis.

    Returns a dict with ``flops``, ``bytes_accessed`` (HBM traffic estimate),
    ``arithmetic_intensity`` (flops/byte — compare against the hardware
    ridge point to see whether a program is compute- or bandwidth-bound),
    and the raw ``cost_analysis`` mapping.
    """
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = executable_cost(compiled)
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", ca.get("bytes_accessed", 0.0)))
    report = {
        "flops": flops,
        "bytes_accessed": byts,
        "arithmetic_intensity": flops / byts if byts else float("inf"),
        "raw": dict(ca),
    }
    try:
        mem = compiled.memory_analysis()
        if mem is not None:
            report["peak_temp_bytes"] = int(
                getattr(mem, "temp_size_in_bytes", 0)
            )
            report["argument_bytes"] = int(
                getattr(mem, "argument_size_in_bytes", 0)
            )
    except Exception:  # memory_analysis unsupported on some backends
        pass
    return report


def benchmark(
    fn: Callable,
    *args,
    iters: int = 20,
    warmup: int = 2,
    items_per_call: Optional[int] = None,
    **kwargs,
) -> Mapping[str, float]:
    """Time a (jitted) callable: ms/iter with block_until_ready fencing.

    If ``items_per_call`` is given (e.g. the batch size), also reports
    ``items_per_sec`` — the framework's headline samples/s/chip metric.
    """
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    result = {"ms_per_iter": dt * 1e3, "iters": float(iters)}
    if items_per_call:
        result["items_per_sec"] = items_per_call / dt
    return result


# --------------------------------------------------------------------------
# Streaming training meter
# --------------------------------------------------------------------------

class Meter:
    """Streaming samples/s + scalar metric meter for training loops.

    Host-side and allocation-free per step; call :meth:`update` after each
    step with the number of samples processed, read :attr:`rate` any time.

    Replaces the reference notebooks' ad-hoc ``loss_hist = np.append(...)``
    pattern (SURVEY.md §5 "Metrics / logging") without forcing a device sync:
    pass metric values only when you already synced (e.g. every log interval).
    """

    def __init__(self, window: int = 100):
        self.window = window
        self.reset()

    def reset(self) -> None:
        self._times: list[float] = []
        self._counts: list[int] = []
        self.history: dict[str, list[float]] = {}
        self.steps = 0

    def update(self, num_items: int = 0, **metrics: float) -> None:
        now = time.perf_counter()
        self._times.append(now)
        self._counts.append(num_items)
        if len(self._times) > self.window:
            self._times.pop(0)
            self._counts.pop(0)
        self.steps += 1
        for k, v in metrics.items():
            self.history.setdefault(k, []).append(float(v))

    @property
    def rate(self) -> float:
        """Items/s over the trailing window."""
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        n = sum(self._counts[1:])
        return n / dt if dt > 0 else 0.0

    def last(self, name: str) -> float:
        return self.history[name][-1]

    def mean(self, name: str, last_n: Optional[int] = None) -> float:
        vals = self.history[name]
        if last_n:
            vals = vals[-last_n:]
        return sum(vals) / len(vals)
