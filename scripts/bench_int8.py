"""Throughput of the int8 XLA serving step vs the bf16 champion.

Same measurement protocol as bench.py (donated state, 200-step chains,
RTT-subtracted).  Usage: python scripts/bench_int8.py [batches...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gtcrn_micro_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro  # noqa: E402
from gtcrn_micro_tpu.ops.int8_step import Int8Serving  # noqa: E402
from gtcrn_micro_tpu.quant.fake_quant import act_qparams  # noqa: E402
from gtcrn_micro_tpu.quant.ptq import observe_ranges  # noqa: E402
from gtcrn_micro_tpu.utils.profiling import measure_rtt, sync  # noqa: E402


def chain_latency(step, state, spec, rtt, n=200):
    out, state = step(state, spec)
    sync(out)
    for _ in range(5):
        out, state = step(state, spec)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out, state = step(state, spec)
    sync(out)
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n


def main() -> None:
    batches = [int(b) for b in sys.argv[1:]] or [4096, 16384, 32768, 49152]
    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    calib = jnp.asarray(
        rng.standard_normal((4, 257, 16, 2)).astype(np.float32) * 0.3
    )
    ranges = observe_ranges(model, params, calib, batch_size=4)
    act_qp = {
        p: act_qparams(jnp.float32(lo), jnp.float32(hi), 8)
        for p, (lo, hi) in ranges.items()
    }
    serving = Int8Serving(model, params, act_qp)
    step = jax.jit(serving.step, donate_argnums=(0,))

    rtt = measure_rtt()
    print(f"# sync RTT {rtt * 1e3:.1f} ms")
    for batch in batches:
        try:
            state = serving.init_state(batch)
            spec = jnp.zeros((batch, 257, 1, 2), jnp.bfloat16)
            lat = chain_latency(step, state, spec, rtt)
        except Exception as e:
            print(f"batch {batch}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        rt = "RT" if lat < 0.010 else "over"
        print(f"int8 batch {batch:6d}: {lat * 1e3:7.3f} ms/frame "
              f"({lat / batch * 1e9:6.1f} ns/stream) [{rt}]", flush=True)


if __name__ == "__main__":
    main()
