"""Shuffle-fold ablation (VERDICT r2 #2 evidence).

The channel interleave is 2 one-hot dots + add per GTConv block (6 blocks).
Folding it into adjacent pointwise weights would remove those dots but --
per the basis analysis in PERF.md r3 -- every fold variant still has to
materialize the combined 16-channel tensor at each block boundary (the
passive half mixes both halves, and the decoder's skip adds pin the
encoder/decoder bases together), so the BEST a fold can do is replace the
dot kernels with a copy-class kernel of the same bytes.

This script measures that upper bound directly: step time with the real
interleave vs step time with the interleave REPLACED by a plain channel
concat (numerically wrong, identical shapes/liveness, one fused copy
instead of two one-hot dots).  If concat ~= dots, the fold is a measured
no-op; if concat is materially faster, a weight-space fold is worth the
basis-tracking complexity.

Usage: python scripts/ablate_shuffle.py [batch]
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
from gtcrn_micro_tpu.nn import blocks  # noqa: E402
from gtcrn_micro_tpu.utils.profiling import measure_rtt, sync  # noqa: E402


def measure(model, params, batch, rtt, chain=160, repeats=3):
    state = model.init_state(batch, dtype=jnp.bfloat16)
    spec = jnp.zeros((batch, model.config.n_freqs, 1, 2), jnp.bfloat16)
    step = jax.jit(model.step, donate_argnums=(1,))
    out, state = step(params, state, spec)
    sync(out)
    for _ in range(4):
        out, state = step(params, state, spec)
    sync(out)
    lats = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(chain):
            out, state = step(params, state, spec)
        sync(out)
        lats.append((time.perf_counter() - t0 - rtt) / chain)
    lats.sort()
    return lats[len(lats) // 2], lats[0], lats[-1]


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    model = GTCRNMicro()
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16), model.init(jax.random.PRNGKey(0))
    )
    rtt = measure_rtt()
    print(f"# sync RTT {rtt * 1e3:.1f} ms, batch {batch}", flush=True)

    real = measure(model, params, batch, rtt)
    print(f"interleave (2 one-hot dots): {real[0] * 1e3:.3f} ms/step "
          f"[{real[1] * 1e3:.3f},{real[2] * 1e3:.3f}]", flush=True)

    orig = blocks.GTConvBlock.shuffle

    def stack_reshape(x1, x2):
        # the EXACT interleave as a layout op (the r2-rejected form --
        # rejected at 16k-32k streams; the cohort regime is different)
        half = x1.shape[-1]
        return jnp.stack([x1, x2], axis=-1).reshape(
            x1.shape[:-1] + (2 * half,)
        )

    try:
        blocks.GTConvBlock.shuffle = staticmethod(
            lambda x1, x2: jnp.concatenate([x1, x2], axis=-1)
        )
        model2 = GTCRNMicro()  # rebuild so blocks pick up the patch
        concat = measure(model2, params, batch, rtt)
        print(f"plain concat (fold's floor): {concat[0] * 1e3:.3f} ms/step "
              f"[{concat[1] * 1e3:.3f},{concat[2] * 1e3:.3f}]", flush=True)

        blocks.GTConvBlock.shuffle = staticmethod(stack_reshape)
        model3 = GTCRNMicro()
        sr = measure(model3, params, batch, rtt)
        print(f"stack+reshape (exact):       {sr[0] * 1e3:.3f} ms/step "
              f"[{sr[1] * 1e3:.3f},{sr[2] * 1e3:.3f}]", flush=True)
    finally:
        blocks.GTConvBlock.shuffle = orig

    delta = (real[0] - concat[0]) / real[0] * 100
    print(f"fold upper bound: {delta:+.1f}% of the step; "
          f"exact stack+reshape delta: "
          f"{(real[0] - sr[0]) / real[0] * 100:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
