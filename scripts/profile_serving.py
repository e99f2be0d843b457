"""Trace the bf16 ring serving step on the real TPU and break down device time.

VERDICT r1 item 2: reconcile the measured ~0.23 us/stream-step against the
~45 KB/stream bf16 state floor.  Takes a jax.profiler trace of N chained
steps at a given batch, parses the Perfetto JSON it emits, and prints
device-op time grouped by op category.

Usage:  python scripts/profile_serving.py [batch] [--folded]
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

jax.config.update("jax_compilation_cache_dir", "/tmp/gtcrn_micro_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro  # noqa: E402
from gtcrn_micro_tpu.utils.profiling import measure_rtt, sync  # noqa: E402


def categorize(name: str) -> str:
    n = name.lower()
    if "dynamic-update-slice" in n or "dynamic_update_slice" in n:
        return "ring-write (DUS)"
    if "dynamic-slice" in n or "dynamic_slice" in n:
        return "ring-read (DS)"
    if n.startswith("copy") or ".copy" in n:
        return "copy"
    if "reshape" in n or "transpose" in n or "bitcast" in n:
        return "reshape/transpose"
    if "conv" in n:
        return "conv"
    if "dot" in n:
        return "dot"
    if "fusion" in n:
        return "fusion (elementwise)"
    return "other"


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    folded = "--folded" in sys.argv
    chunk = 1
    if "--chunk" in sys.argv:
        chunk = int(sys.argv[sys.argv.index("--chunk") + 1])
    steps = 10

    audio = "--audio" in sys.argv

    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    if folded:
        from gtcrn_micro_tpu.models.folding import fold_bn_params

        params = fold_bn_params(params)
    params = jax.tree.map(lambda v: jnp.asarray(v, jnp.bfloat16), params)

    state = model.init_state(batch, dtype=jnp.bfloat16)
    if audio:
        # the exact bench.py headline executable: online STFT -> model ->
        # online iSTFT, MXU-DFT form (dsp/stream_dsp.py)
        from gtcrn_micro_tpu.dsp.stft import sqrt_hann_window
        from gtcrn_micro_tpu.dsp.stream_dsp import DspState, make_audio_step

        window = sqrt_hann_window(model.config.win_len)
        astep = jax.jit(make_audio_step(model, window, dft="mxu"),
                        donate_argnums=(1, 2))
        dsp = DspState(
            in_buf=jnp.zeros((batch, model.config.hop_len), jnp.bfloat16),
            ola_buf=jnp.zeros((batch, model.config.hop_len), jnp.bfloat16),
        )
        chunk_in = jnp.zeros((batch, model.config.hop_len), jnp.bfloat16)

        def step(params, state, _spec):
            nonlocal dsp
            out, dsp, state = astep(params, dsp, state, chunk_in)
            return out, state

        spec = None
    else:
        spec = jnp.zeros((batch, model.config.n_freqs, chunk, 2), jnp.bfloat16)
        step = jax.jit(model.step, donate_argnums=(1,))

    out, state = step(params, state, spec)
    sync(out)
    rtt = measure_rtt()

    # steady-state latency (chained, RTT-subtracted)
    t0 = time.perf_counter()
    for _ in range(200):
        out, state = step(params, state, spec)
    sync(out)
    lat = (time.perf_counter() - t0 - rtt) / 200
    print(f"batch {batch} folded={folded} audio={audio} chunk={chunk}: "
          f"{lat * 1e3:.3f} ms/step "
          f"({lat / chunk * 1e3:.3f} ms/frame, "
          f"{lat / chunk / batch * 1e9:.0f} ns/stream-frame)", flush=True)

    log_dir = (f"/tmp/gtcrn_trace_b{batch}{'_folded' if folded else ''}"
               f"{'_audio' if audio else ''}"
               f"{f'_c{chunk}' if chunk > 1 else ''}")
    jax.profiler.start_trace(log_dir)
    for _ in range(steps):
        out, state = step(params, state, spec)
    sync(out)
    jax.profiler.stop_trace()

    # parse the Perfetto trace: device-side complete events only
    paths = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace emitted", flush=True)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device PIDs: process_name metadata containing "TPU" / "/device:"
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower():
                dev_pids.add(e["pid"])
    by_cat = collections.Counter()
    by_name = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0)  # microseconds
        # skip trace-framework rows (steps, XLA modules aggregate)
        if name.startswith(("jit_", "XLA Modules", "Steps")):
            continue
        by_cat[categorize(name)] += dur
        by_name[name] += dur
        total += dur

    print(f"\ndevice total {total / 1e3:.2f} ms over {steps} steps "
          f"({total / steps / 1e3:.3f} ms/step)")
    print("\nby category (ms over all steps):")
    for cat, dur in by_cat.most_common():
        print(f"  {dur / 1e3:8.2f}  {100 * dur / total:5.1f}%  {cat}")
    print("\ntop 25 ops:")
    for name, dur in by_name.most_common(25):
        print(f"  {dur / 1e3:8.2f}  {100 * dur / total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
