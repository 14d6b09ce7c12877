"""Tracing / profiling helpers.

The reference's only runtime telemetry is per-epoch wall time, peak CUDA
memory, and manual grad norms (reference train_custom.py:47-65,
train_transfer.py:75,139). TPU-native equivalents:

  * `trace(dir)` — jax.profiler context producing TensorBoard/XProf
    traces,
  * `time_fn` — steady-state timing with block_until_ready,
  * `device_memory_stats` — HBM usage from the device allocator,
  * `enable_nan_debug` — jax_debug_nans for the race/sanitizer slot
    (JAX's functional purity replaces torch-side race detection;
    NaN-checking is the debug hook that remains meaningful).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict


@contextlib.contextmanager
def trace(log_dir: str = "outputs/profile"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10,
            **kw) -> Dict[str, float]:
    """Median/mean steady-state latency of a jitted callable.

    Each iteration ends with a host fetch of one output leaf, not just
    block_until_ready — the tunneled TPU backend acknowledges
    block_until_ready before execution finishes, but a value fetch
    cannot complete early. (This also matches what a serving caller
    observes: results are only useful on the host.)"""
    import jax
    import numpy as np

    def sync(out):
        np.asarray(jax.tree.leaves(out)[0])

    for _ in range(warmup):
        out = fn(*args, **kw)
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        sync(out)
        times.append(time.perf_counter() - t0)
    return {"mean_s": float(np.mean(times)),
            "median_s": float(np.median(times)),
            "min_s": float(np.min(times))}


def device_memory_stats() -> Dict[str, float]:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {k: v / (1024 ** 2) for k, v in stats.items()
                if isinstance(v, (int, float))}
    except Exception:
        return {}


def enable_nan_debug(enable: bool = True):
    import jax

    jax.config.update("jax_debug_nans", enable)
