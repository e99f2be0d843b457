"""Per-boundary int8 sensitivity analysis of the quantized model.

For each of the 59 activation-quant boundaries: quality when ONLY that
boundary runs at int8 (all others int16) -- the boundary's own damage --
and quality when that boundary runs at int16 while all others are int8
(how much rescuing it buys).  One jit compile total: scale/zero/clip bounds
are traced arrays, so swapping per-path precision does not retrace.

Output drives the mixed-precision artifact decision (VERDICT r1 item 1/3).

Usage: python scripts/quant_sensitivity.py [--checkpoint <ckpt.tar>]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gtcrn_micro_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft  # noqa: E402
from gtcrn_micro_tpu.io.wav import read_wav  # noqa: E402
from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro  # noqa: E402
from gtcrn_micro_tpu.nn.core import Ctx  # noqa: E402
from gtcrn_micro_tpu.quant.fake_quant import act_qparams, weight_qparams  # noqa: E402
from gtcrn_micro_tpu.quant.parity import snr_db  # noqa: E402
from gtcrn_micro_tpu.quant.qat import (  # noqa: E402
    build_distill_corpus,
    enhance_fp32,
)
from gtcrn_micro_tpu.quant.ptq import observe_ranges  # noqa: E402


class TracedQuantizer:
    """FakeQuantizer whose per-path (scale, zero, qmin, qmax) are TRACED
    values -- one compiled graph serves every precision assignment."""

    def __init__(self, table: dict):
        self.table = table  # path -> (scale, zero, qmin, qmax) arrays

    def act(self, ctx, leaf, x):
        s, z, qmin, qmax = self.table[ctx.path(leaf)]
        q = jnp.clip(jnp.round(x / s) + z, qmin, qmax)
        return (q - z) * s

    def weight(self, ctx, leaf, w, channel_axis):
        qp = weight_qparams(w, channel_axis)  # int8 weights everywhere
        q = jnp.clip(jnp.round(w / qp.scale), -128, 127)
        return q * qp.scale


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--checkpoint",
        default="/root/reference/gtcrn_micro/ckpts/best_model_dns3.tar",
    )
    parser.add_argument(
        "--wav",
        default="/root/reference/gtcrn_micro/examples/gtcrn_micro/noisy5.wav",
    )
    ns = parser.parse_args()

    from gtcrn_micro_tpu.eval.infer import load_params

    model = GTCRNMicro()
    params = load_params(ns.checkpoint)
    window = sqrt_hann_window(512)

    # calibration corpus = examples 1-4 (QAT protocol)
    wav_dir = os.path.dirname(ns.wav)
    train = [os.path.join(wav_dir, f"noisy{i}.wav") for i in range(1, 5)]
    noisy, _targets = build_distill_corpus(model, params, train)
    specs = np.asarray(stft(jnp.asarray(noisy), window))
    ranges = observe_ranges(model, params, specs, batch_size=4)
    paths = list(ranges)

    wav, _ = read_wav(ns.wav)
    if wav.ndim > 1:
        wav = wav[:, 0]
    target = enhance_fp32(model, params, wav)
    spec = stft(jnp.asarray(wav, jnp.float32)[None], window)

    def table_for(bits_of: dict[str, int]):
        tab = {}
        for p in paths:
            lo, hi = ranges[p]
            qp = act_qparams(jnp.float32(lo), jnp.float32(hi), bits_of[p])
            tab[p] = (jnp.float32(qp.scale), jnp.float32(qp.zero),
                      jnp.float32(qp.qmin), jnp.float32(qp.qmax))
        return tab

    @jax.jit
    def run(tab):
        ctx = Ctx()
        ctx.quant = TracedQuantizer(tab)
        return model._forward(params, spec, ctx)

    def quality(tab) -> float:
        enh = run(tab)
        out = np.asarray(istft(enh, window, length=len(wav)))[0]
        return snr_db(target, out)

    all16 = quality(table_for({p: 16 for p in paths}))
    all8 = quality(table_for({p: 8 for p in paths}))
    print(f"all-int16 acts: {all16:.1f} dB   all-int8 acts: {all8:.1f} dB")

    rows = []
    for p in paths:
        only = quality(table_for({q: (8 if q == p else 16) for q in paths}))
        rescue = quality(table_for({q: (16 if q == p else 8) for q in paths}))
        rows.append((p, only, rescue))
        print(f"  {p:35s} only-int8 {only:6.1f} dB   rescued {rescue:6.1f} dB",
              flush=True)

    print("\nworst boundaries (lowest only-int8 SNR):")
    for p, only, rescue in sorted(rows, key=lambda r: r[1])[:10]:
        print(f"  {p:35s} {only:6.1f} dB (rescue -> {rescue:6.1f})")

    # greedy mixed-precision: lift the worst boundary to int16 until >= 40 dB
    bits = {p: 8 for p in paths}
    lifted = []
    cur = all8
    order = [p for p, _, _ in sorted(rows, key=lambda r: r[1])]
    for p in order:
        if cur >= 40.0 or len(lifted) >= 12:
            break
        bits[p] = 16
        cur = quality(table_for(bits))
        lifted.append((p, cur))
        print(f"lift {p:35s} -> {cur:6.1f} dB", flush=True)
    print("\ngreedy int16 set:", [p for p, _ in lifted])
    print(f"final mixed quality: {cur:.1f} dB with {len(lifted)} int16 boundaries")


if __name__ == "__main__":
    main()
