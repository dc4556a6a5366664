"""Profiling / roofline instrumentation.

The reference has no tracing at all (SURVEY §5).  This module provides:
- ``trace(logdir)``: context manager around ``jax.profiler`` traces
  (view with TensorBoard or xprof);
- ``step_stats``: wall-time + achieved edges/s, FLOP/s and HBM GB/s
  estimates for a train/eval step, against v5e peak numbers, giving a
  quick roofline position without a full trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax

from ..timing import device_sync, fetch_rtt

# TPU v5e (lite) per-chip peaks (public figures)
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_F32_TFLOPS = 49.0
V5E_HBM_GBPS = 819.0


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 20) -> float:
    """Mean wall time of ``fn`` ending in a device->host VALUE fetch.

    ``jax.block_until_ready`` is NOT a barrier on the axon remote-TPU
    tunnel (see gsn_tpu.timing) — the loop must retire the dispatch
    queue with :func:`device_sync` and subtract the fetch round-trip.
    """
    out = fn(*args)  # warmup/compile
    rtt = fetch_rtt(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_sync(out)
    return max((time.perf_counter() - t0 - rtt) / iters, 0.0)


def flops_of(fn: Callable, *args) -> Optional[float]:
    """XLA's own FLOP estimate for the compiled fn (None if unavailable)."""
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) or None
    except Exception:
        return None


def step_stats(fn: Callable, *args, num_edges: int,
               iters: int = 20) -> Dict[str, float]:
    """Roofline summary of one jitted step."""
    dt = time_fn(fn, *args, iters=iters)
    stats = {"step_ms": dt * 1e3, "edges_per_s": num_edges / dt}
    fl = flops_of(fn, *args)
    if fl:
        stats["tflops"] = fl / dt / 1e12
        stats["mxu_util_f32"] = fl / dt / 1e12 / V5E_PEAK_F32_TFLOPS
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        ba = float(analysis.get("bytes accessed", 0.0))
        if ba:
            stats["hbm_gbps"] = ba / dt / 1e9
            stats["hbm_util"] = ba / dt / 1e9 / V5E_HBM_GBPS
    except Exception:
        pass
    return stats
