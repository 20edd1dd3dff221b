"""Profiling / tracing / model introspection (SURVEY.md §5.1).

The reference's observability is wall-clock timers around inference
(test.py:183-189) and a parameter table (model_structure.py:44-212, with
commented-out FLOPs experiments). TPU-native equivalents:

- ``trace``            — context manager around ``jax.profiler`` emitting an
  xplane trace viewable in TensorBoard/XProf.
- ``time_fn``          — compile-excluded steady-state timing; syncs with a
  device→host value fetch and reports a two-window slope (see ``_hard_sync``
  for why ``block_until_ready`` cannot be trusted on tunneled backends).
- ``param_table``      — per-leaf param counts/bytes (model_structure parity).
- ``cost_analysis``    — XLA's own FLOPs/bytes estimate for a jitted fn, the
  working replacement for the reference's abandoned ptflops experiments; use
  with ``roofline`` to get achieved-vs-peak utilization per step.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _hard_sync(out) -> None:
    """Device->host value fetch of one leaf — the only reliable execution
    barrier on tunneled PJRT backends (measured on the axon TPU relay:
    ``jax.block_until_ready`` returned before the dispatched work finished,
    under-reporting 8-step programs 25×; fetching a value cannot lie)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2,
            **kwargs) -> dict:
    """Steady-state seconds/call of a (jitted) fn, compile excluded.

    Uses two timing windows of n and 2n calls and reports the slope
    ``(T(2n) - T(n)) / n``: each window ends in a hard value-fetch sync whose
    constant latency (~35 ms through the tunnel) and any constant dispatch
    tail cancel in the difference, leaving pure per-call cost."""
    out = fn(*args, **kwargs)       # ensures compile regardless of warmup
    for _ in range(max(warmup - 1, 0)):
        out = fn(*args, **kwargs)
    _hard_sync(out)

    def window(n: int) -> float:
        t0 = time.perf_counter()
        o = out
        for _ in range(n):
            o = fn(*args, **kwargs)
        _hard_sync(o)
        return time.perf_counter() - t0

    t1 = window(iters)
    slope = (window(2 * iters) - t1) / iters
    if slope <= 0:                  # noise ate the slope: one retry, then a
        t1 = window(iters)          # mean window as the last resort
        slope = (window(2 * iters) - t1) / iters
        if slope <= 0:
            slope = window(2 * iters) / (2 * iters)
    return {"seconds_per_call": slope, "calls_per_s": 1.0 / slope}


def param_count(params: Any) -> int:
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(params))


def param_table(params: Any, *, print_fn=None) -> list[dict]:
    """Per-leaf name/shape/params/bytes rows + total (reference
    model_structure.py:44-212 table semantics)."""
    rows = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", getattr(
            p, "name", p)))) for p in path)
        n = int(np.prod(leaf.shape))
        rows.append({"name": name, "shape": tuple(leaf.shape), "params": n,
                     "bytes": n * leaf.dtype.itemsize})
    total = sum(r["params"] for r in rows)
    if print_fn:
        width = max(len(r["name"]) for r in rows) if rows else 10
        print_fn(f"{'name':<{width}}  {'shape':>20}  {'params':>12}")
        for r in rows:
            print_fn(f"{r['name']:<{width}}  {str(r['shape']):>20}  "
                     f"{r['params']:>12,}")
        print_fn(f"{'TOTAL':<{width}}  {'':>20}  {total:>12,}")
    return rows


def cost_analysis(fn: Callable, *args, **kwargs) -> dict:
    """XLA cost analysis (flops / bytes accessed) of fn's compiled module."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {"flops": float(ca.get("flops", float("nan"))),
            "bytes_accessed": float(ca.get("bytes accessed", float("nan")))}


# Peak numbers for roofline context (public spec sheet values).
PEAK_TFLOPS = {"v5e": {"bf16": 394.0, "f32": 98.5}, "v5p": {"bf16": 459.0}}
PEAK_HBM_GBPS = {"v5e": 819.0, "v5p": 2765.0}


def roofline(fn: Callable, *args, chip: str = "v5e", dtype: str = "f32",
             iters: int = 20, **kwargs) -> dict:
    """Measured utilization vs peak: achieved TFLOP/s and GB/s of a jitted fn
    against the chip's roofline."""
    costs = cost_analysis(fn, *args, **kwargs)
    timing = time_fn(jax.jit(fn), *args, iters=iters, **kwargs)
    sec = timing["seconds_per_call"]
    tflops = costs["flops"] / sec / 1e12
    gbps = costs["bytes_accessed"] / sec / 1e9
    return {
        **costs, **timing,
        "achieved_tflops": tflops,
        "achieved_gbps": gbps,
        "flops_utilization": tflops / PEAK_TFLOPS[chip][dtype],
        "hbm_utilization": gbps / PEAK_HBM_GBPS[chip],
    }
