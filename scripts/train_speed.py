"""Training-step throughput: f32 (reference recipe) vs bf16 mixed precision.

Times the full jit'd train step (STFT -> fwd -> loss -> bwd -> clip ->
Adam -> BN fold) with the bench methodology (donated chains between scalar
fetches, RTT-corrected, median of 3) at the PERF.md batch shapes and prints
audio-throughput multiples.

Usage (one TPU process at a time):
    python scripts/train_speed.py [--crop_s 8 --batches 16,64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(step_fn, params, opt_state, noisy, clean, *, chain=12,
            repeats=3, rtt=0.0) -> float:
    from gtcrn_micro_tpu.utils.profiling import sync

    p, s = params, opt_state
    p, s, loss = step_fn(p, s, noisy, clean)  # compile
    sync(loss)
    lats = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(chain):
            p, s, loss = step_fn(p, s, noisy, clean)
        sync(loss)
        lats.append((time.perf_counter() - t0 - rtt) / chain)
    lats.sort()
    return lats[len(lats) // 2]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--crop_s", type=float, default=8.0)
    parser.add_argument("--batches", default="16,64")
    ns = parser.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
    from gtcrn_micro_tpu.train.trainer import make_optimizer, make_train_step
    from gtcrn_micro_tpu.utils.profiling import measure_rtt

    model = GTCRNMicro()
    params_host = jax.device_get(model.init(jax.random.PRNGKey(0)))
    opt = make_optimizer(params_host)
    rtt = measure_rtt()
    print(f"# RTT {rtt * 1e3:.1f} ms; device {jax.devices()[0].device_kind}",
          flush=True)

    n = int(ns.crop_s * 16000)
    rng = np.random.default_rng(0)
    for b in (int(x) for x in ns.batches.split(",")):
        clean = jnp.asarray(
            rng.standard_normal((b, n)).astype(np.float32) * 0.05
        )
        noisy = clean + 0.02 * jnp.asarray(
            rng.standard_normal((b, n)).astype(np.float32)
        )
        audio_s = b * ns.crop_s
        for name, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
            step = jax.jit(
                make_train_step(model, opt, compute_dtype=dtype),
                donate_argnums=(0, 1),
            )
            # fresh device buffers per run: the step donates params/opt_state
            params = jax.tree.map(jnp.asarray, params_host)
            t = measure(step, params, opt.init(params), noisy, clean, rtt=rtt)
            print(f"batch {b:3d} x {ns.crop_s:.0f}s  {name:4s}: "
                  f"{t * 1e3:7.1f} ms/step = {audio_s / t:7.0f}x real-time",
                  flush=True)


if __name__ == "__main__":
    main()
