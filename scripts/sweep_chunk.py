"""Chunk-size x batch serving sweep on the real TPU (VERDICT r2 #1 evidence).

For each (T, batch): median of 3 independent step chains, each chain
processing ~CHAIN_FRAMES frames of audio per stream.  Prints a table of
effective ms/frame (= step latency / T) and the spread across chains.

Usage: python scripts/sweep_chunk.py [--fast]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gtcrn_micro_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro  # noqa: E402
from gtcrn_micro_tpu.utils.profiling import measure_rtt, sync  # noqa: E402

CHAIN_FRAMES = 192  # frames of audio each chain streams (per config)


def chain_latency(model, params, batch: int, chunk: int, rtt: float,
                  repeats: int = 3) -> tuple[float, float, float]:
    """(median, min, max) seconds per FRAME over ``repeats`` chains."""
    steps = max(CHAIN_FRAMES // chunk, 24)
    state = model.init_state(batch, dtype=jnp.bfloat16)
    spec = jnp.zeros((batch, model.config.n_freqs, chunk, 2), jnp.bfloat16)
    step = jax.jit(model.step, donate_argnums=(1,))

    out, state = step(params, state, spec)  # compile
    sync(out)
    for _ in range(4):  # warm
        out, state = step(params, state, spec)
    sync(out)

    lats = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            out, state = step(params, state, spec)
        sync(out)
        el = time.perf_counter() - t0 - rtt
        lats.append(max(el, 1e-9) / steps / chunk)
    lats.sort()
    return lats[len(lats) // 2], lats[0], lats[-1]


def main() -> None:
    fast = "--fast" in sys.argv
    model = GTCRNMicro()
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16), model.init(jax.random.PRNGKey(0))
    )
    rtt = measure_rtt()
    print(f"# sync RTT {rtt * 1e3:.1f} ms; median of 3 chains, "
          f"{CHAIN_FRAMES} frames/chain", flush=True)

    batches = [16384, 32768, 40960] if fast else [
        8192, 16384, 32768, 40960, 49152, 65536
    ]
    chunks = [1, 2, 4, 8]
    print(f"# {'batch':>7} " + " ".join(f"T={t:<2d} ms/frame (spread)".rjust(26)
                                        for t in chunks), flush=True)
    for b in batches:
        row = [f"{b:9d}"]
        for t in chunks:
            try:
                med, lo, hi = chain_latency(model, params, b, t, rtt)
                row.append(f"{med * 1e3:8.3f} [{lo * 1e3:7.3f},{hi * 1e3:7.3f}]")
            except Exception as e:  # noqa: BLE001
                row.append(f"FAIL {type(e).__name__}".rjust(26))
        print(" ".join(row), flush=True)


if __name__ == "__main__":
    main()
