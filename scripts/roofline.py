"""HBM roofline for the headline serving step: how far from speed of light?

Three numbers, all measured on the real chip with the bench methodology
(donated-state chains between scalar fetches, median of >=3):

1. **Achievable HBM bandwidth** of this chip through this tunnel: a jit'd
   ``y = x + 1`` over a ~1 GB bf16 array moves 2N bytes/step (read + write)
   with negligible compute -- its sustained rate is the practical ceiling
   any bandwidth-bound step can hit (STREAM-triad analog).
2. **Measured headline step** (audio-in -> audio-out, B = 8,192 bf16, the
   bench.py champion config) -> implied HBM bytes/stream at that bandwidth.
3. **Accounted traffic floors** from the model structure itself:
   - *ideal single-kernel SOL*: per stream per step, an oracle kernel reads
     2 tap frames + writes 1 frame per temporal ring (every temporal conv
     in the family has kT=3: (kT-1)=2 taps), r/w the O(1) DSP carry, and
     streams the audio hop in/out; weights amortize over the batch.
   - *whole-state r+w*: a naive fused kernel that touches every ring slot.

The gap between (2) and the ideal floor is XLA's op-granularity tax: each
conv/dot boundary materialises its (B,1,33,16)-class activation to HBM
(PERF.md trace section).  Closing it requires whole-model fusion, which
Mosaic on this tunnel loses 5x on compute (PERF.md fused-kernel sections)
-- so the XLA step is the shipped champion and this script quantifies how
close it runs to its own floor and to absolute SOL.

Usage (one TPU process at a time -- see CLAUDE.md):
    python scripts/roofline.py [--batch 8192]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def measure_bw(nbytes: int = 1 << 30, chain: int = 30, repeats: int = 3,
               rtt: float = 0.0) -> float:
    """Sustained HBM GB/s of a jit'd bf16 ``x + 1`` (2N bytes per step)."""
    from gtcrn_micro_tpu.utils.profiling import sync

    n = nbytes // 2  # bf16 elements
    x = jnp.zeros((n,), jnp.bfloat16)

    @jax.jit
    def step(x):
        return x + jnp.bfloat16(1.0)

    x = step(x)
    sync(x)
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(chain):
            x = step(x)
        sync(x)
        dt = time.perf_counter() - t0 - rtt
        rates.append(2.0 * nbytes * chain / dt / 1e9)
    rates.sort()
    return rates[len(rates) // 2]


def accounted_floors(model, batch: int) -> dict[str, float]:
    """Per-stream bytes/step floors derived from the model's own state tree.

    Every temporal ring leaf has shape (B, L, ...) with frame size
    prod(shape[2:]); kT == 3 for every temporal conv in this family
    (nn/blocks.py, nn/core.TRALite), so an ideal kernel reads 2 tap frames
    and writes 1 frame per ring per step.
    """
    state = model.init_state(batch=1, dtype=jnp.bfloat16, ring=True)
    leaves = jax.tree_util.tree_leaves(state)
    ideal = 0  # elements
    whole = 0
    for leaf in leaves:
        if leaf.ndim < 2:  # step counter
            continue
        frame = 1
        for d in leaf.shape[2:]:
            frame *= d
        ideal += 3 * frame          # 2 tap reads + 1 write
        whole += 2 * leaf.size      # read + write every slot
    hop = model.config.hop_len
    dsp = 2 * (2 * hop)             # in_buf + ola_buf, read + write
    io = 2 * hop                    # audio hop in + out
    params = sum(
        v.size for v in jax.tree_util.tree_leaves(
            model.init(jax.random.PRNGKey(0))
        )
    )
    bytes_per = 2  # bf16 serving config
    return {
        "ideal_per_stream": (ideal + dsp + io) * bytes_per
        + params * bytes_per / batch,
        "whole_state_per_stream": (whole + dsp + io) * bytes_per
        + params * bytes_per / batch,
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8192)
    parser.add_argument("--bw_gb", type=float, default=0.0,
                        help="skip the BW microbench and use this GB/s")
    ns = parser.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    sys.path.insert(0, ".")
    from bench import measure_step_latency

    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
    from gtcrn_micro_tpu.utils.profiling import measure_rtt

    model = GTCRNMicro()
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16),
        model.init(jax.random.PRNGKey(0)),
    )
    rtt = measure_rtt()
    print(f"# RTT {rtt * 1e3:.1f} ms; device {jax.devices()[0].device_kind}",
          flush=True)

    bw = ns.bw_gb or measure_bw(rtt=rtt)
    print(f"achievable HBM bandwidth (bf16 x+1 triad): {bw:.0f} GB/s",
          flush=True)

    med, lo, hi = measure_step_latency(model, params, ns.batch, rtt=rtt)
    per_stream_us = med / ns.batch * 1e6
    implied = per_stream_us * 1e-6 * bw * 1e9
    print(f"headline audio step @ {ns.batch}: {med * 1e3:.3f} ms "
          f"[{lo * 1e3:.3f},{hi * 1e3:.3f}] = {per_stream_us:.4f} us/stream",
          flush=True)
    print(f"implied HBM traffic at {bw:.0f} GB/s: "
          f"{implied / 1024:.1f} KB/stream/step", flush=True)

    floors = accounted_floors(model, ns.batch)
    ideal = floors["ideal_per_stream"]
    whole = floors["whole_state_per_stream"]
    print(f"ideal single-kernel SOL:  {ideal / 1024:.1f} KB/stream/step "
          f"-> {ideal / bw / 1e9 * 1e6:.4f} us/stream", flush=True)
    print(f"whole-state r+w bound:    {whole / 1024:.1f} KB/stream/step "
          f"-> {whole / bw / 1e9 * 1e6:.4f} us/stream", flush=True)
    print(f"step vs ideal SOL: {implied / ideal:.2f}x; "
          f"vs whole-state bound: {implied / whole:.2f}x", flush=True)


if __name__ == "__main__":
    main()
