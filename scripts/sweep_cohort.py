"""Cohort round-robin serving sweep (phase-staggered batches).

A real-time serving deployment need not put every stream in ONE batched
step: the chip can run K independent cohorts of B streams, one step each
per 16 ms frame interval, phases staggered so each cohort's step starts
right after its frames arrive.  Constraints for honesty:

- keep-up:   K * step_time <= 16 ms (one frame per stream per interval)
- latency:   16/K ms (max phase mismatch) + step_time <= 10 ms budget

This measures (a) the per-batch step-time curve with medians, and (b) the
ACTUAL aggregate rate of stepping K independent states round-robin (same
executable, K state buffers), to confirm cohorts cost what single-chain
timing predicts.

Usage: python scripts/sweep_cohort.py
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

FRAME_S = 0.016
BUDGET_S = 0.010


def max_cohorts(med: float) -> int:
    """Largest K meeting keep-up (K*med <= 16 ms) and latency
    (med + 16/K <= 10 ms); 0 if no K works."""
    return max((k for k in range(1, 65)
                if k * med <= FRAME_S and med + FRAME_S / k <= BUDGET_S),
               default=0)


def main() -> None:
    model = GTCRNMicro()
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16), model.init(jax.random.PRNGKey(0))
    )
    rtt = measure_rtt()
    print(f"# sync RTT {rtt * 1e3:.1f} ms", flush=True)

    results = {}
    for b in [2048, 4096, 6144, 8192, 12288, 16384]:
        spec = jnp.zeros((b, model.config.n_freqs, 1, 2), jnp.bfloat16)
        step = jax.jit(model.step, donate_argnums=(1,))
        state = model.init_state(b, dtype=jnp.bfloat16)
        out, state = step(params, state, spec)
        sync(out)
        for _ in range(4):
            out, state = step(params, state, spec)
        sync(out)
        lats = []
        for _ in range(3):
            n = 160
            t0 = time.perf_counter()
            for _ in range(n):
                out, state = step(params, state, spec)
            sync(out)
            lats.append((time.perf_counter() - t0 - rtt) / n)
        lats.sort()
        med = lats[1]
        results[b] = med
        k = max_cohorts(med)
        print(f"batch {b:6d}: {med * 1e3:7.3f} ms/step "
              f"[{lats[0] * 1e3:.3f},{lats[2] * 1e3:.3f}]  "
              f"-> K={k} cohorts = {k * b} streams "
              f"(worst latency {(med + FRAME_S / max(k, 1)) * 1e3:.2f} ms)",
              flush=True)

    # empirical round-robin verification at the best config
    best_b = max(results, key=lambda b: b * max_cohorts(results[b]))
    med = results[best_b]
    k = max_cohorts(med)
    print(f"\n# verifying round-robin: K={k} x batch {best_b} "
          f"= {k * best_b} streams", flush=True)
    spec = jnp.zeros((best_b, model.config.n_freqs, 1, 2), jnp.bfloat16)
    step = jax.jit(model.step, donate_argnums=(1,))
    states = [model.init_state(best_b, dtype=jnp.bfloat16) for _ in range(k)]
    for i in range(k):
        out, states[i] = step(params, states[i], spec)
    sync(out)
    rounds = 40
    t0 = time.perf_counter()
    for _ in range(rounds):
        for i in range(k):
            out, states[i] = step(params, states[i], spec)
    sync(out)
    el = time.perf_counter() - t0 - rtt
    per_round = el / rounds
    per_step = per_round / k
    print(f"round-robin: {per_round * 1e3:.3f} ms per K-round "
          f"({per_step * 1e3:.3f} ms/step vs single-chain {med * 1e3:.3f}); "
          f"keep-up {'OK' if per_round <= FRAME_S else 'FAIL'} "
          f"({per_round * 1e3:.2f} <= 16 ms), "
          f"worst latency {(per_step + FRAME_S / k) * 1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
