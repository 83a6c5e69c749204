"""Profiling / tracing as a first-class feature.

The reference has no profiling beyond wall-clock prints (SURVEY §5.1).
Here: ``jax.profiler`` trace capture around arbitrary step ranges (view in
TensorBoard / Perfetto), a step timer with compile-time separation, and an
MFU estimate from XLA's own cost analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax

# peak dense f32/bf16 FLOPs per chip; v5e ~197 TFLOPs bf16
PEAK_FLOPS = {"tpu-v5e": 197e12, "tpu-v4": 275e12, "cpu": 1e11}


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Separates first-call (compile) time from steady-state step time."""

    def __init__(self):
        self.compile_s: Optional[float] = None
        self.times = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        if self.compile_s is None:
            self.compile_s = dt
        else:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        import numpy as np

        if not self.times:
            return {"compile_s": self.compile_s or 0.0}
        arr = np.asarray(self.times)
        return {
            "compile_s": self.compile_s or 0.0,
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
        }


def estimate_mfu(fn: Callable, args, step_seconds: float, peak_flops: Optional[float] = None) -> float:
    """MFU = (XLA-reported FLOPs per call) / (peak * step_seconds)."""
    lowered = jax.jit(fn).lower(*args)

    def _flops(cost):
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        return float((cost or {}).get("flops", 0.0))

    flops = _flops(lowered.cost_analysis())
    if not flops:
        # some backends only report cost post-compile (compilation is cached)
        flops = _flops(lowered.compile().cost_analysis())
    if peak_flops is None:
        kind = jax.devices()[0].device_kind.lower()
        peak_flops = 197e12 if "v5 lite" in kind or "v5e" in kind else 275e12
    return flops / (peak_flops * step_seconds)
