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


# On this TPU tunnel ``block_until_ready`` does NOT actually block (the
# relay acks immediately -- measured 27,000 TFLOP/s "matmuls"); only a value
# fetch round-trips.  The shared helpers live in utils/profiling.
from gtcrn_micro_tpu.utils.profiling import measure_rtt, sync as _sync  # noqa: E402


def measure_step_latency(model, params, batch: int, *, chain: int = 200,
                         rtt: float = 0.0, dtype=jnp.bfloat16) -> float:
    """Steady-state seconds per streaming step at ``batch`` concurrent
    streams: N sequentially-dependent steps between two syncs, minus the
    fixed sync RTT.  State is donated (in-place cache updates, as a real
    server would run)."""
    state = model.init_state(batch, dtype=dtype)
    spec = jnp.zeros((batch, model.config.n_freqs, 1, 2), dtype)
    step = jax.jit(model.step, donate_argnums=(1,))

    out, state = step(params, state, spec)  # compile
    _sync(out)
    for _ in range(5):
        out, state = step(params, state, spec)
    _sync(out)

    t0 = time.perf_counter()
    for _ in range(chain):
        out, state = step(params, state, spec)
    _sync(out)
    elapsed = time.perf_counter() - t0 - rtt
    return max(elapsed, 1e-9) / chain


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro

    model = GTCRNMicro()
    # serving config: bf16 params/state/activations (42 dB vs fp32 on the
    # reference checkpoint -- better than the int8 path's 28 dB)
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16),
        model.init(jax.random.PRNGKey(0)),
    )

    rtt = measure_rtt()
    print(f"# sync RTT: {rtt * 1e3:.1f} ms (amortized over 200-step chains)",
          flush=True)

    # exponential sweep, then one binary refinement step
    best, over, results = 0, None, {}
    batch = 1024
    while batch <= 131072:
        try:
            lat = measure_step_latency(model, params, batch, rtt=rtt)
        except Exception:  # OOM or compile failure at this size
            break
        results[batch] = lat
        if lat < LATENCY_BUDGET_S:
            best = batch
            batch *= 2
        else:
            over = batch
            break
    if over is not None:
        for _ in range(2):
            mid = (best + over) // 2 // 1024 * 1024
            if mid in (best, over) or mid <= 0:
                break
            lat = measure_step_latency(model, params, mid, rtt=rtt)
            results[mid] = lat
            if lat < LATENCY_BUDGET_S:
                best = mid
            else:
                over = mid

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
