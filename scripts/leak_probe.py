"""Host-RSS leak probe for the training loop (r5: ref-scale run OOM).

The 27.5k-step reference-scale run died at step ~12,050 when the HOST ran
out of memory: RSS grew by almost exactly one batch pair per step
(8 x 160,000 x f32 x 2 = 10.24 MB).  Every Python-side structure in
train.py is bounded (pending_losses flushes, the prefetch queue is capped,
the dataset holds paths only), so this probe isolates the retention by
layer and backend:

  --mode putonly   device_put the batch, never compute
  --mode compute   device_put + a trivial jitted reduction per step
  --mode full      device_put + the real jitted train step (donated
                   params/opt_state, pending-loss flush every 50)

  --platform cpu   pure-JAX control (no tunnel): a leak here is OUR bug
  --platform axon  the real backend: a leak only here is tunnel-client
                   buffer retention, to be worked around in train.py

Prints VmRSS every --log-every steps; a per-step slope ~= the batch nbytes
convicts that (mode, platform) combination.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["cpu", "axon"], default="cpu")
    ap.add_argument("--mode", choices=["putonly", "compute", "full", "all"],
                    default="full")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--samples", type=int, default=160000)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--reuse", action="store_true",
                    help="reuse ONE host buffer pair instead of fresh "
                         "arrays per step (the real loader is fresh)")
    ns = ap.parse_args()

    import jax

    if ns.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import jax.numpy as jnp
    import numpy as np

    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
    from gtcrn_micro_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from gtcrn_micro_tpu.train.trainer import (
        TrainerConfig, make_optimizer, make_train_step,
    )

    batch_mb = ns.batch * ns.samples * 4 * 2 / 1e6
    print(f"# platform={ns.platform} mode={ns.mode} batch pair = "
          f"{batch_mb:.1f} MB", flush=True)

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    # the real loader hands the loop FRESH numpy arrays every step; default
    # mirrors that (a rebound fresh array only grows RSS if something
    # retains it).  --reuse pins ONE pair: if fresh leaks and reuse doesn't,
    # retention is keyed to host-buffer identity.
    noisy_h = rng.standard_normal((ns.batch, ns.samples)).astype(np.float32)
    clean_h = rng.standard_normal((ns.batch, ns.samples)).astype(np.float32)

    def run_mode(mode: str) -> float:
        params = opt_state = step_fn = None
        if mode == "full":
            model = GTCRNMicro()
            params = model.init(jax.random.PRNGKey(0))
            tcfg = TrainerConfig(precision="bf16")
            optimizer = make_optimizer(params)
            opt_state = optimizer.init(params)
            params = replicate(mesh, params)
            opt_state = replicate(mesh, opt_state)
            step_fn = jax.jit(
                make_train_step(model, optimizer, trainer_cfg=tcfg,
                                compute_dtype=jnp.bfloat16),
                donate_argnums=(0, 1),
            )
        elif mode == "compute":
            step_fn = jax.jit(lambda n, c: jnp.mean(n) + jnp.mean(c))

        pending: list = []
        t0 = time.time()
        r0 = None
        print(f"# [{mode}] step 0 rss={rss_mb():.0f} MB (pre-warm)",
              flush=True)
        for i in range(1, ns.steps + 1):
            if ns.reuse:
                nh, ch = noisy_h, clean_h
            else:
                nh, ch = noisy_h.copy(), clean_h.copy()
            noisy, clean = shard_batch(mesh, (nh, ch))
            if mode == "putonly":
                pass
            elif mode == "compute":
                pending.append(step_fn(noisy, clean))
            else:
                params, opt_state, loss = step_fn(
                    params, opt_state, noisy, clean)
                pending.append(loss)
            if pending and i % 50 == 0:
                float(jnp.stack(pending).sum())
                pending.clear()
            if i % ns.log_every == 0 or i == 1:
                r = rss_mb()
                if r0 is None:
                    r0 = r  # baseline AFTER warm-up (compile + transfers)
                slope = (r - r0) / max(i - ns.log_every, 1)
                print(f"[{mode}] step {i:5d} rss={r:8.0f} MB  "
                      f"slope={slope:+7.3f} MB/step  "
                      f"t={time.time() - t0:6.0f}s", flush=True)
        if pending:
            float(jnp.stack(pending).sum())
            pending.clear()
        r = rss_mb()
        per_step = (r - (r0 or r)) / max(ns.steps - ns.log_every, 1)
        verdict = "LEAK" if per_step > 0.2 * batch_mb else "clean"
        print(f"# [{mode}] {verdict}: {per_step:+.3f} MB/step over "
              f"{ns.steps} steps (batch pair {batch_mb:.1f} MB)", flush=True)
        return per_step

    modes = ["putonly", "compute", "full"] if ns.mode == "all" else [ns.mode]
    for m in modes:
        run_mode(m)
    return 0


if __name__ == "__main__":
    sys.exit(main())
