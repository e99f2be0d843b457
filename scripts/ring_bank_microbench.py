"""Microbench: separate small rings vs one stacked ring bank.

Reproduces the serving step's L==2 ring pattern (2 dynamic tap reads + 1
dynamic DUS write per ring, taps feeding a tiny conv) in isolation, in two
state layouts:

  separate : 8 rings of (B, 2, 33, 16)   -- the shipped layout
  bank     : one (8, B, 2, 33, 16) tensor, static ring index + dynamic slot

Hypothesis (PERF.md r3): XLA's memory-space assignment stages each small
ring wholesale in scoped VMEM and evicts it with a full-ring copy per step
(copy-start/copy-done in the HLO), so every L==2 ring pays ~2x its bytes in
HBM traffic; one bank is too big to stage, forcing the one-frame in-place
DUS everyone wants.

Usage: python scripts/ring_bank_microbench.py [batch]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gtcrn_micro_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from gtcrn_micro_tpu.utils.profiling import measure_rtt, sync  # noqa: E402

N_RINGS = 8
L = 2
F, C = 33, 16


def conv_w(key):
    return jax.random.normal(key, (1, 3, 1, C), jnp.bfloat16) * 0.1


def sep_step(ws, state, x):
    """state: dict of N_RINGS rings (B, L, F, C) + step; x (B, 1, F, C)."""
    t = state["step"]
    h = x
    new = {}
    for i in range(N_RINGS):
        ring = state[f"r{i}"]
        out = jax.lax.conv_general_dilated(
            h, ws[i], (1, 1), [(0, 0), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        for j in range(2):
            slot = jax.lax.rem(t + j, L)
            tap = jax.lax.dynamic_slice_in_dim(ring, slot, 1, axis=1)
            out = out + jax.lax.conv_general_dilated(
                tap, ws[i], (1, 1), [(0, 0), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
        new[f"r{i}"] = jax.lax.dynamic_update_slice_in_dim(
            ring, h, jax.lax.rem(t, L), axis=1)
        h = out
    new["step"] = (t + 1) & 15
    return h, new


def bank_step(ws, state, x):
    """state: {"bank": (N_RINGS, B, L, F, C), "step"}; x (B, 1, F, C)."""
    t = state["step"]
    bank = state["bank"]
    h = x
    zero = jnp.zeros((), jnp.int32)
    for i in range(N_RINGS):
        out = jax.lax.conv_general_dilated(
            h, ws[i], (1, 1), [(0, 0), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        for j in range(2):
            slot = jax.lax.rem(t + j, L)
            tap = jax.lax.dynamic_slice(
                bank, (jnp.int32(i), zero, slot, zero, zero),
                (1, bank.shape[1], 1, F, C))[0]
            out = out + jax.lax.conv_general_dilated(
                tap, ws[i], (1, 1), [(0, 0), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
        bank = jax.lax.dynamic_update_slice(
            bank, h[None], (jnp.int32(i), zero, jax.lax.rem(t, L), zero, zero))
        h = out
    return h, {"bank": bank, "step": (t + 1) & 15}


def run(name, step, state, ws, x, chain=200):
    step = jax.jit(step, donate_argnums=(1,))
    out, state = step(ws, state, x)
    sync(out)
    rtt = measure_rtt()
    for _ in range(4):
        out, state = step(ws, state, x)
    sync(out)
    lats = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(chain):
            out, state = step(ws, state, x)
        sync(out)
        lats.append((time.perf_counter() - t0 - rtt) / chain)
    lats.sort()
    txt = jax.jit(step, donate_argnums=(1,)).lower(ws, state, x).compile().as_text()
    n_copy = len(re.findall(r" copy\(", txt))
    n_cps = len(re.findall(r"copy-start", txt))
    print(f"{name:9s}: {lats[1] * 1e3:7.3f} ms/step  "
          f"[{lats[0] * 1e3:.3f},{lats[2] * 1e3:.3f}]  "
          f"copies={n_copy} copy-starts={n_cps}", flush=True)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    keys = jax.random.split(jax.random.PRNGKey(0), N_RINGS)
    ws = [conv_w(k) for k in keys]
    x = jnp.zeros((batch, 1, F, C), jnp.bfloat16)

    sep = {f"r{i}": jnp.zeros((batch, L, F, C), jnp.bfloat16)
           for i in range(N_RINGS)}
    sep["step"] = jnp.zeros((), jnp.int32)
    run("separate", sep_step, sep, ws, x)

    bank = {"bank": jnp.zeros((N_RINGS, batch, L, F, C), jnp.bfloat16),
            "step": jnp.zeros((), jnp.int32)}
    run("bank", bank_step, bank, ws, x)


if __name__ == "__main__":
    main()
