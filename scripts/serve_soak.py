"""Wall-clock serving soak: CohortServer paced at REAL 16 ms intervals.

bench.py's keep-up/latency verdicts come from back-to-back round-robin step
timing -- a derived contract (r4 verdict #5: "serving latency is derived,
not observed").  This soak OBSERVES it: the host sleeps to each interval's
absolute ``time.monotonic`` start, dispatches the K cohort steps
back-to-back (each lands near its phase slot because step time ~= the
16/K ms phase width -- the schedule the keep-up verdict promises), runs
>= 30 s, admits and releases streams mid-run (including forced dirty-slot
resets, the r3 privacy-bug path), and reports a per-frame latency
histogram.

Probing: every P-th interval the main loop blocks on fetching one element
of the just-dispatched cohort's output; the sample's latency is
(fetch completion) - (that cohort's phase-slot schedule) - (calibrated
RTT).  The fetch itself stalls ~1.6 interval of schedule -- observation
tax a production server (async result DMA) would not pay -- so overruns
inside the 2 intervals after a probe are reported separately as
``probe_artifact_overruns`` and excluded from the pass verdict.  A v1 of
this script fetched from a sampler thread instead; on this 1-core host
the fetch starves against the dispatching main loop (every probe
materialized only when dispatch stopped, reading ~60 s of fake latency)
and the GIL contention tripled dispatch cost -- main-thread sparse
probing is the design that measures what the device actually does.

Pass/fail (reported, not enforced): probe p99 + (16/K) ms phase allowance
<= 10 ms budget AND zero non-artifact enqueue overruns.

Run (TPU must be otherwise idle; host near-idle -- CLAUDE.md):
  python scripts/serve_soak.py [--batch 8192 --cohorts 9 --seconds 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRAME_S = 0.016
BUDGET_S = 0.010


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--cohorts", type=int, default=9)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--probe-every", type=int, default=64,
                    help="probe one cohort every P intervals (each probe "
                         "stalls ~26 ms of schedule; 64 -> the 0.5 ms/"
                         "interval dispatch slack re-amortizes it)")
    ap.add_argument("--admit-every", type=float, default=2.0,
                    help="seconds between admission/release events")
    ap.add_argument("--warm-seconds", type=float, default=20.0,
                    help="free-run the round-robin this long before the "
                         "paced phase: the tunnel device runs ~2x slower "
                         "for its first ~15 s of activity (PERF.md r5)")
    ap.add_argument("--l2_psum", action="store_true")
    ap.add_argument("--out", default="/tmp/serve_soak.json")
    ns = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
    from gtcrn_micro_tpu.serve import CohortServer
    from gtcrn_micro_tpu.utils.profiling import measure_rtt, sync

    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))

    print("# attaching to device (may stall ~15 min after a previous TPU "
          "process exit)", flush=True)
    t_at = time.monotonic()
    rtt = measure_rtt()
    print(f"# attached in {time.monotonic() - t_at:.0f} s; fetch RTT "
          f"{rtt * 1e3:.1f} ms", flush=True)

    state_opts = {"l2_psum": True} if ns.l2_psum else {}
    srv = CohortServer(model, params, batch=ns.batch, n_cohorts=ns.cohorts,
                       dtype=jnp.bfloat16, mode="audio",
                       state_opts=state_opts or None)
    K = ns.cohorts
    chunk = jnp.zeros((ns.batch, model.config.hop_len), jnp.bfloat16)

    # warm the executable + states (compile happens here, off the clock),
    # then free-run until the device leaves its cold phase
    for c in range(K):
        out = srv.step(c, chunk)
    sync(out)
    t_w = time.monotonic()
    warm_steps = 0
    while time.monotonic() - t_w < ns.warm_seconds:
        for c in range(K):
            out = srv.step(c, chunk)
        warm_steps += K
        if warm_steps % (50 * K) == 0:
            sync(out)
    sync(out)
    warm_rate = (time.monotonic() - t_w) / max(warm_steps, 1)
    print(f"# compiled + warmed ({warm_steps} steps, steady "
          f"{warm_rate * 1e3:.2f} ms/step); starting paced soak", flush=True)

    n_intervals = int(ns.seconds / FRAME_S)
    phase = FRAME_S / K
    overruns = 0            # dispatched later than sched + one phase slot
    artifact_overruns = 0   # ... within 2 intervals of a blocking probe
    admits = releases = forced_resets = 0
    active: list[tuple[int, int]] = []  # (cohort, slot)
    next_admit = ns.admit_every
    samples: list[tuple[float, float]] = []  # (sched, latency)
    last_probe_n = -10

    t0 = time.monotonic() + 0.05  # schedule epoch
    for n in range(n_intervals):
        start = t0 + n * FRAME_S
        now = time.monotonic()
        if start > now:
            time.sleep(start - now)
        probe_c = (n // ns.probe_every) % K if n % ns.probe_every == 0 \
            else -1
        for c in range(K):
            sched = start + c * phase
            late = time.monotonic() - sched
            if late > phase:
                if n - last_probe_n <= 2:
                    artifact_overruns += 1
                else:
                    overruns += 1
            out = srv.step(c, chunk)
            if c == probe_c:
                # blocking in-band fetch: returns when this cohort's step
                # output exists on the host (queue is shallow -- the loop
                # paces at the frame rate, so this reads completion lag)
                np.asarray(out[:1, :1])
                samples.append(
                    (sched, time.monotonic() - sched - rtt))
                last_probe_n = n
        # admission churn between intervals (host-side bookkeeping; a
        # forced reset of a dirty slot adds real device work in-band)
        if (n + 1) * FRAME_S >= next_admit:
            next_admit += ns.admit_every
            if len(active) >= 4:
                c, s = active.pop(0)
                srv.release(c, s)
                releases += 1
                # exercise the dirty-slot path: re-admit from the recycled
                # pool by resetting it now (admit() would do this lazily)
                srv.reset_slot(c, s)
                forced_resets += 1
            c = srv.next_cohort()
            active.append((c, srv.admit(c)))
            admits += 1

    sync(out)
    wall = time.monotonic() - t0

    lats = sorted(lat for _, lat in samples)
    if not lats:
        print("no samples collected", flush=True)
        return 1

    def pct(p):
        return lats[min(int(p / 100 * len(lats)), len(lats) - 1)]

    report = {
        "batch": ns.batch, "cohorts": K,
        "streams": ns.batch * K,
        "state": "l2_psum" if ns.l2_psum else "ring",
        "seconds": round(wall, 3),
        "intervals": n_intervals,
        "steps_fired": n_intervals * K,
        "probes": len(lats),
        "fetch_rtt_ms": round(rtt * 1e3, 2),
        "latency_ms": {
            "p50": round(pct(50) * 1e3, 3),
            "p90": round(pct(90) * 1e3, 3),
            "p99": round(pct(99) * 1e3, 3),
            "max": round(lats[-1] * 1e3, 3),
        },
        "phase_allowance_ms": round(phase * 1e3, 3),
        "p99_plus_phase_ms": round((pct(99) + phase) * 1e3, 3),
        "budget_ms": BUDGET_S * 1e3,
        "enqueue_overruns": overruns,
        "probe_artifact_overruns": artifact_overruns,
        "budget_misses": sum(1 for la in lats if la + phase > BUDGET_S),
        "admits": admits, "releases": releases,
        "forced_resets": forced_resets,
        "pass": (pct(99) + phase <= BUDGET_S and overruns == 0),
    }
    with open(ns.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
