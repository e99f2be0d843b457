"""Workaround probe for the axon device_put host leak (scripts/leak_probe.py).

leak_probe.py convicted the transfer layer itself: on the axon backend,
``jax.device_put`` of a fresh host batch leaks the batch's nbytes in host
RSS every call (putonly mode, no compute at all); the CPU backend is
clean.  This probe measures candidate workarounds in ONE process (one
attach stall total), 200 steps each:

  baseline   fresh numpy -> device_put           (the convicted pattern)
  delete     + explicitly arr.delete() after use
  gc         + gc.collect() every 50 steps
  reuse      ONE pinned host pair, device_put per step
  asarray    jnp.asarray (no sharding arg)
  donate     feed the put arrays to a jitted fn that donates them

Whichever is clean and cheapest becomes the train.py data path.
"""

from __future__ import annotations

import argparse
import gc
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
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--samples", type=int, default=160000)
    ap.add_argument("--modes", default="baseline,delete,gc,reuse,asarray,donate")
    ns = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import jax.numpy as jnp
    import numpy as np

    from gtcrn_micro_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    batch_mb = ns.batch * ns.samples * 4 * 2 / 1e6
    rng = np.random.default_rng(0)
    noisy_h = rng.standard_normal((ns.batch, ns.samples)).astype(np.float32)
    clean_h = rng.standard_normal((ns.batch, ns.samples)).astype(np.float32)

    donate_fn = jax.jit(lambda n, c: jnp.float32(0) * n[0, 0] + c[0, 0] * 0,
                        donate_argnums=(0, 1))

    def run(mode: str) -> float:
        t0 = time.time()
        r0 = None
        keep = None
        for i in range(1, ns.steps + 1):
            if mode == "reuse":
                nh, ch = noisy_h, clean_h
            else:
                nh, ch = noisy_h.copy(), clean_h.copy()
            if mode == "asarray":
                noisy, clean = jnp.asarray(nh), jnp.asarray(ch)
            else:
                noisy, clean = shard_batch(mesh, (nh, ch))
            if mode == "donate":
                keep = donate_fn(noisy, clean)
            elif mode == "delete":
                noisy.delete()
                clean.delete()
            if mode == "gc" and i % 50 == 0:
                gc.collect()
            if i % 50 == 0 or i == 1:
                if keep is not None:
                    float(keep)  # drain dispatch
                r = rss_mb()
                if r0 is None:
                    r0 = r
                print(f"[{mode:8s}] step {i:4d} rss={r:8.0f} MB "
                      f"t={time.time() - t0:5.0f}s", flush=True)
        r = rss_mb()
        per_step = (r - r0) / max(ns.steps - 50, 1)
        verdict = "LEAK" if per_step > 0.2 * batch_mb else "CLEAN"
        print(f"# [{mode:8s}] {verdict}: {per_step:+.3f} MB/step "
              f"(batch pair {batch_mb:.1f} MB)", flush=True)
        return per_step

    print(f"# batch pair = {batch_mb:.1f} MB; attaching...", flush=True)
    for m in ns.modes.split(","):
        run(m)
    return 0


if __name__ == "__main__":
    sys.exit(main())
