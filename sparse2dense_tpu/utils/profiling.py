"""Profiling / complexity utilities.

Replaces the reference's module-hook MAC counter (det3d/utils/
flops_counter.py:59 get_model_complexity_info) and ad-hoc
cuda.synchronize timing (tools/simple_inference_waymo.py:94-99) with
XLA-native equivalents: compiled-HLO cost analysis for FLOPs/bytes, a
trace-context helper around jax.profiler, and a block_until_ready timer.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable


def get_model_complexity_info(fn: Callable, *args, **kwargs) -> dict:
    """FLOPs / HBM bytes of a jitted function from XLA's cost analysis."""
    import jax

    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
        "params": None,  # use param_count for parameter counts
    }


def param_count(params) -> int:
    import jax
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs):
    """Mean wall time of fn with device sync (block_until_ready)."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args, **kwargs))
    dt = (time.perf_counter() - t0) / iters
    return dt, out
