"""Profiling utilities: jax.profiler traces + simple step timing.

The reference's tracing story is wall-clock prints (SURVEY.md §5:
time.perf_counter in gtcrn_micro_stream.py:628-634, esp_timer on device).
The TPU-native answer is a real profiler trace viewable in
TensorBoard/Perfetto, plus an honest step timer that works through TPU
tunnels where ``block_until_ready`` does not synchronize (see bench.py).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gtcrn_micro_tpu_trace"):
    """``with trace(dir): ...`` -> Perfetto/TensorBoard trace in ``dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def sync(x) -> float:
    """Force completion by fetching one scalar (tunnel-safe sync point)."""
    return float(jnp.ravel(x)[0])


def measure_rtt(iters: int = 5) -> float:
    """Median fixed cost of one host value-fetch through the TPU tunnel
    (~28 ms here); subtract it from chained-step timings."""
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    sync(f(x))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f(x))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def time_fn(fn, *args, iters: int = 100, **kwargs) -> float:
    """Seconds per call of a jitted fn, amortizing the sync RTT over
    ``iters`` calls with the SAME arguments.

    NOTE: unusable for functions with donated arguments (the first call
    consumes the buffers) -- time a donating step by chaining its outputs
    yourself, as bench.measure_step_latency does."""
    out = fn(*args, **kwargs)
    sync(jax.tree.leaves(out)[0])
    rtt = measure_rtt()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    sync(jax.tree.leaves(out)[0])
    return max(time.perf_counter() - t0 - rtt, 1e-12) / iters
