"""Trace the jit'd training step on the real TPU and break down device time.

Same methodology as scripts/profile_serving.py (Perfetto trace -> device-op
categories), applied to the full train step (STFT -> fwd -> loss incl.
iSTFT x2 -> bwd -> clip -> Adam -> BN fold).

Usage:  python scripts/profile_train.py [batch] [--crop_s 8] [--f32]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
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

from profile_serving import categorize  # noqa: E402

from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro  # noqa: E402
from gtcrn_micro_tpu.train.trainer import (  # noqa: E402
    make_optimizer,
    make_train_step,
)
from gtcrn_micro_tpu.utils.profiling import measure_rtt, sync  # noqa: E402


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    crop_s = 8.0
    if "--crop_s" in sys.argv:
        crop_s = float(sys.argv[sys.argv.index("--crop_s") + 1])
    dtype = None if "--f32" in sys.argv else jnp.bfloat16
    steps = 8

    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(params)
    opt_state = opt.init(params)
    step = jax.jit(
        make_train_step(model, opt, compute_dtype=dtype),
        donate_argnums=(0, 1),
    )

    n = int(crop_s * 16000)
    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32) * 0.05)
    noisy = clean + 0.02 * jnp.asarray(
        rng.standard_normal((batch, n)).astype(np.float32)
    )

    params, opt_state, loss = step(params, opt_state, noisy, clean)
    sync(loss)
    rtt = measure_rtt()
    t0 = time.perf_counter()
    for _ in range(12):
        params, opt_state, loss = step(params, opt_state, noisy, clean)
    sync(loss)
    lat = (time.perf_counter() - t0 - rtt) / 12
    name = "f32" if dtype is None else "bf16"
    print(f"train step batch {batch} x {crop_s:.0f}s {name}: "
          f"{lat * 1e3:.1f} ms/step", flush=True)

    log_dir = f"/tmp/gtcrn_trace_train_b{batch}_{name}"
    jax.profiler.start_trace(log_dir)
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, noisy, clean)
    sync(loss)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace emitted", flush=True)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname or "/device" in pname.lower():
                dev_pids.add(e["pid"])
    by_cat = collections.Counter()
    by_name = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        ename = e.get("name", "")
        dur = e.get("dur", 0)
        if ename.startswith(("jit_", "XLA Modules", "Steps")):
            continue
        by_cat[categorize(ename)] += dur
        by_name[ename] += dur
        total += dur

    print(f"\ndevice total {total / 1e3:.2f} ms over {steps} steps "
          f"({total / steps / 1e3:.3f} ms/step)")
    print("\nby category (ms over all steps):")
    for cat, dur in by_cat.most_common():
        print(f"  {dur / 1e3:8.2f}  {100 * dur / total:5.1f}%  {cat}")
    print("\ntop 25 ops:")
    for opname, dur in by_name.most_common(25):
        print(f"  {dur / 1e3:8.2f}  {100 * dur / total:5.1f}%  {opname[:110]}")


if __name__ == "__main__":
    main()
