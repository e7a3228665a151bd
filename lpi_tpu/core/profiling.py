"""Profiling & accounting: traces, step timing, HBM usage, FLOPs.

The reference's observability is wall-clock ETA logging plus
`torch.cuda.max_memory_allocated` prints (`engine/trainer.py:179-207`) and a
thop-based flops counter (`utils/flops.py`, `utils/stats.py`). TPU-native
equivalents:

* `trace(logdir)`           — context manager around `jax.profiler` traces
                              (view in TensorBoard / xprof);
* `StepTimer`               — per-step wall clock with a hard device sync
                              (value fetch — `block_until_ready` can return
                              early on tunnel platforms);
* `device_memory_stats`     — per-device HBM bytes-in-use / peak;
* `compiled_flops`          — XLA's own cost analysis of a jitted function
                              (flops + bytes accessed), replacing thop.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per step; call `sync` with any step output to barrier."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            np.asarray(jax.device_get(sync_value))  # hard sync
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    @property
    def p50(self) -> float:
        return float(np.median(self.times)) if self.times else 0.0


def device_memory_stats(device=None) -> dict:
    """HBM stats for one device (empty dict if the backend lacks them)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


def compiled_flops(fn: Callable, *args, **kwargs) -> dict:
    """Lower+compile `fn` and return XLA's cost analysis
    (`flops`, `bytes accessed`...). The model-complexity equivalent of the
    reference's `get_model_complexity_info`."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
        "transcendentals": float(cost.get("transcendentals", 0.0)),
    }
