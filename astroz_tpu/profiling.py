"""Profiling and throughput measurement utilities.

The reference has no tracing layer — its benchmarks time manually with
``std.Io.Timestamp`` deltas and guard dead-code elimination with
``doNotOptimizeAway`` (zig_sgp4_bench.zig:60,135-178). The TPU-native
equivalents: ``jax.profiler`` traces viewable in TensorBoard/Perfetto,
and a throughput harness that blocks on device completion (the
``block_until_ready`` is our doNotOptimizeAway).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/astroz_tpu_trace"):
    """Capture a device trace around a block::

        with profiling.trace("/tmp/trace"):
            propagate(cat, jd)

    View with TensorBoard (profile plugin) or ui.perfetto.dev.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class ThroughputResult:
    seconds_per_call: float
    items_per_second: float
    n_calls: int

    def __str__(self) -> str:
        return (f"{self.items_per_second/1e6:.1f} M items/s "
                f"({self.seconds_per_call*1e3:.2f} ms/call)")


def measure_throughput(fn: Callable, *args, items_per_call: int = 1,
                       n_calls: int = 5, warmup: int = 1,
                       pipelined: bool = True) -> ThroughputResult:
    """Steady-state throughput of a device computation.

    ``pipelined=True`` dispatches all calls before blocking (hides
    per-dispatch launch latency — the realistic serving pattern);
    ``False`` blocks each call (includes launch latency).
    """
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    if pipelined:
        outs = [fn(*args) for _ in range(n_calls)]
        for o in outs:
            jax.block_until_ready(o)
    else:
        for _ in range(n_calls):
            jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / n_calls
    return ThroughputResult(seconds_per_call=dt,
                            items_per_second=items_per_call / dt,
                            n_calls=n_calls)


def device_memory_stats() -> Optional[dict]:
    """Live HBM stats for the first device (None when unsupported)."""
    try:
        return jax.devices()[0].memory_stats()
    except Exception:
        return None
