"""Headline benchmark: concurrent real-time 16 kHz streams per chip.

Serving mode = batched frame-by-frame streaming (the reference's ESP32/TFLM
deployment serves ONE stream per device; the TPU-native equivalent batches
thousands of independent streams through the jit'd streaming step).  A stream
is "real-time" if one 256-sample hop (16 ms of audio) is processed in under
the 10 ms/frame latency budget (BASELINE.md north star).

Prints ONE JSON line:
  {"metric": "concurrent_realtime_streams", "value": N, "unit": "streams",
   "vs_baseline": N/4096}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

LATENCY_BUDGET_S = 0.010  # 10 ms per 16 ms frame (BASELINE.md)
BASELINE_STREAMS = 4096  # north-star target, BASELINE.md / BASELINE.json


def measure_step_latency(model, params, batch: int, *, iters: int = 30,
                         warmup: int = 5) -> float:
    """Steady-state seconds per streaming step at ``batch`` concurrent
    streams (median over ``iters``)."""
    state = model.init_state(batch)
    spec = jnp.zeros((batch, model.config.n_freqs, 1, 2), jnp.float32)
    step = model.step_jit

    out, state = step(params, state, spec)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out, state = step(params, state, spec)
    jax.block_until_ready(out)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out, state = step(params, state, spec)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro

    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))

    # exponential sweep for the largest batch meeting the latency budget
    best, results = 0, {}
    batch = 256
    while batch <= 65536:
        try:
            lat = measure_step_latency(model, params, batch)
        except Exception:  # OOM or compile failure at this size
            break
        results[batch] = lat
        if lat < LATENCY_BUDGET_S:
            best = batch
            batch *= 2
        else:
            break

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}, platform {dev.platform}", flush=True)
    for b, lat in sorted(results.items()):
        rt = "RT" if lat < LATENCY_BUDGET_S else "over-budget"
        print(f"# batch {b:6d}: {lat * 1e3:7.3f} ms/frame [{rt}]", flush=True)

    print(json.dumps({
        "metric": "concurrent_realtime_streams",
        "value": best,
        "unit": "streams",
        "vs_baseline": best / BASELINE_STREAMS,
    }), flush=True)


if __name__ == "__main__":
    main()
