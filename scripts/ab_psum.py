"""A/B: L==2 caches as input rings vs direct-form-II-transposed partials.

Measures the headline audio step (online STFT -> model -> online iSTFT,
MXU-DFT) at the cohort sweet spots with the two state layouts:

- ring (r3 champion): every temporal cache is an input ring; the L==2
  rings are staged in VMEM by XLA's memory-space assignment and evicted
  with a full-ring copy each step (25.8% of the step, PERF.md trace)
- psum (r4 candidate): the 14 L==2 caches carry their two partial OUTPUT
  frames instead (nn/core._psum_call) -- freshly computed values, nothing
  to stage or evict

Run on the TPU: python scripts/ab_psum.py [batches...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from bench import measure_round_robin, measure_step_latency
    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
    from gtcrn_micro_tpu.utils.profiling import measure_rtt

    # --rr K: measure the K-state round-robin schedule (the serving loop the
    # keep-up verdict uses) instead of the single-chain proxy -- e.g.
    # `--rr 10 8192` is the r4-verdict-#6 composed plateau probe verbatim
    argv = sys.argv[1:]
    rr_k = 0
    if argv and argv[0] == "--rr":
        rr_k = int(argv[1])
        argv = argv[2:]
    batches = [int(a) for a in argv] or [8192, 12288]
    model = GTCRNMicro()
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16),
        model.init(jax.random.PRNGKey(0)),
    )
    rtt = measure_rtt()
    print(f"# RTT {rtt * 1e3:.1f} ms", flush=True)
    variants = {
        "ring": {},
        "psum": {"l2_psum": True},
        "fp8": {"store_dtype": jnp.float8_e4m3fn},
        # r4 measured psum and fp8 separately and said "they compose"; the
        # composed config was never A/B'd (r4 verdict #6) -- the L==2 caches
        # stay compute-dtype partials, the L>=4 rings store fp8
        "psum+fp8": {"l2_psum": True, "store_dtype": jnp.float8_e4m3fn},
    }
    for b in batches:
        # interleave variant order across two rounds to control for device
        # window drift; decide on the BEST chain median per variant
        meds = {name: [] for name in variants}
        names = list(variants)
        for order in (names, names[::-1]):
            for name in order:
                if rr_k:
                    med = measure_round_robin(
                        model, params, b, rr_k, rtt=rtt, repeats=5,
                        **variants[name]
                    )
                    lo = hi = med
                else:
                    med, lo, hi = measure_step_latency(
                        model, params, b, rtt=rtt, repeats=5, **variants[name]
                    )
                meds[name].append(med)
                print(f"batch {b:6d} {name:8s}: {med * 1e3:7.3f} ms/step "
                      f"[{lo * 1e3:.3f},{hi * 1e3:.3f}]"
                      + (f" keep-up {rr_k * med * 1e3:.2f}/16 ms"
                         if rr_k else ""), flush=True)
        base = min(meds["ring"])
        for name in names[1:]:
            r = min(meds[name]) / base
            print(f"batch {b:6d} {name}/ring (best-of-2 runs): {r:.3f}x "
                  f"({(1 - r) * 100:+.1f}% step time)", flush=True)


if __name__ == "__main__":
    main()
