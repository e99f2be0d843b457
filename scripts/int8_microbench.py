"""Micro-benchmark: is an int8 pointwise chain faster than bf16 on TPU?

Premise check for the int8 serving path (VERDICT r1 item 1): the serving
step at 16k streams is bound by intermediate-activation HBM round-trips at
conv/dot boundaries; int8 storage halves those bytes IF the requantize
(scale+round+clip) fuses into the dot epilogue instead of materialising
extra tensors (the round-1 int8-ring attempt failed exactly there).

Chains N pointwise layers (B, 33, 16) @ (16, 16) -- the model's dominant
boundary shape -- in three flavours:
  bf16:   x -> dot -> bias+prelu (bf16 out)
  int8:   q -> int8 dot (i32) -> scale+bias+prelu+requant (int8 out)
  int8-noreq: int8 dot but bf16 out (no requant; isolates requant cost)

Usage: python scripts/int8_microbench.py [batch] [n_layers]
"""

from __future__ import annotations

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

from gtcrn_micro_tpu.utils.profiling import measure_rtt, sync  # noqa: E402


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n_layers = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    F, C = 33, 16
    rng = np.random.default_rng(0)
    w8 = jnp.asarray(rng.integers(-127, 128, (n_layers, C, C)), jnp.int8)
    wb = w8.astype(jnp.bfloat16) * jnp.bfloat16(0.01)
    bias = jnp.asarray(rng.standard_normal((n_layers, C)), jnp.float32)

    xb = jnp.asarray(rng.standard_normal((batch, F, C)), jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 128, (batch, F, C)), jnp.int8)

    @jax.jit
    def chain_bf16(x):
        for i in range(n_layers):
            y = jnp.dot(x, wb[i], preferred_element_type=jnp.float32)
            y = y + bias[i]
            x = jnp.maximum(y, 0.1 * y).astype(jnp.bfloat16)
        return x

    def requant(y, i):
        # scale + bias + prelu + round/clip back to int8 (epilogue chain)
        v = y.astype(jnp.float32) * jnp.float32(0.01) + bias[i]
        v = jnp.maximum(v, 0.1 * v)
        return jnp.clip(jnp.round(v * 12.7), -128, 127).astype(jnp.int8)

    @jax.jit
    def chain_int8(q):
        for i in range(n_layers):
            acc = jax.lax.dot_general(
                q, w8[i], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            q = requant(acc, i)
        return q

    @jax.jit
    def chain_int8_noreq(q):
        x = None
        for i in range(n_layers):
            if x is None:
                acc = jax.lax.dot_general(
                    q, w8[i], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            else:
                acc = jnp.dot(x, wb[i], preferred_element_type=jnp.float32)
            y = acc.astype(jnp.float32) + bias[i]
            x = jnp.maximum(y, 0.1 * y).astype(jnp.bfloat16)
        return x

    rtt = measure_rtt()
    print(f"# batch {batch}, {n_layers} layers, sync RTT {rtt * 1e3:.1f} ms")

    for name, fn, arg in (
        ("bf16", chain_bf16, xb),
        ("int8", chain_int8, xq),
        ("int8-noreq", chain_int8_noreq, xq),
    ):
        try:
            out = fn(arg)
            sync(out)
        except Exception as e:  # compile/backend rejection is a result too
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        t0 = time.perf_counter()
        reps = 50
        for _ in range(reps):
            out = fn(arg)
        sync(out)
        dt = (time.perf_counter() - t0 - rtt) / reps
        per = dt / n_layers / batch * 1e9
        print(f"{name:12s}: {dt * 1e3:7.3f} ms/chain  "
              f"{per:6.2f} ns/stream-layer", flush=True)


if __name__ == "__main__":
    main()
