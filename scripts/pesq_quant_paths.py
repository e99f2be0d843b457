"""Wideband PESQ of every serving/quantized path vs the fp32 pipeline.

The reference's README leaves its TFLite (int8) quality rows as "..."
(WIP); this table answers the question for every path in this framework:
enhance the 5 shipped noisy wavs per path, score wb-PESQ (eval/pesq.py)
using the fp32 enhancement as the reference signal.

Usage: python scripts/pesq_quant_paths.py [adaround_dir] [mixed_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
from gtcrn_micro_tpu.eval.infer import load_params
from gtcrn_micro_tpu.eval.pesq import pesq_wb
from gtcrn_micro_tpu.io.wav import read_wav
from gtcrn_micro_tpu.models.folding import fold_bn_params
from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
from gtcrn_micro_tpu.nn.core import Ctx
from gtcrn_micro_tpu.quant.adaround import load_act_qp
from gtcrn_micro_tpu.quant.calibration import calibration_specs
from gtcrn_micro_tpu.quant.ptq import FakeQuantizer, make_quantized_model
from gtcrn_micro_tpu.utils.checkpoint import CheckpointManager

CKPT = "/root/reference/gtcrn_micro/ckpts/best_model_dns3.tar"
WAV_DIR = "/root/reference/gtcrn_micro/examples/gtcrn_micro"


def main() -> None:
    ar_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gtcrn_adaround4"
    model = GTCRNMicro()
    params = load_params(CKPT)
    folded = fold_bn_params(params)
    window = sqrt_hann_window(model.config.win_len)

    wavs = {}
    for i in range(1, 6):
        w, fs = read_wav(os.path.join(WAV_DIR, f"noisy{i}.wav"))
        if w.ndim > 1:
            w = w[:, 0]
        wavs[i] = w

    def enhance(forward, p, wav):
        spec = stft(jnp.asarray(wav, jnp.float32)[None], window)
        out = forward(p, spec)
        return np.asarray(istft(out, window, length=len(wav)))[0]

    fp32 = {i: enhance(model.apply_jit, params, w) for i, w in wavs.items()}

    paths = {}

    # bf16 serving config (offline apply in bf16, like the ring server)
    bf16_params = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params)
    paths["bf16 serving"] = {
        i: enhance(
            lambda p, s: model.apply_jit(p, s.astype(jnp.bfloat16)).astype(
                jnp.float32
            ),
            bf16_params, w,
        )
        for i, w in wavs.items()
    }

    # bf16 AUDIO serving (the exact bench.py headline config: ring caches,
    # online STFT/iSTFT, MXU-DFT, bf16 end-to-end; T=16 hop chunks)
    from gtcrn_micro_tpu.dsp.stream_dsp import DspState, make_audio_step

    T_CHUNK = 16
    hop = model.config.hop_len
    max_hops = max(len(w) // hop for w in wavs.values())
    max_hops += (-max_hops) % T_CHUNK
    batch = np.zeros((5, max_hops * hop), np.float32)
    for i, w in wavs.items():
        batch[i - 1, : len(w)] = w[: max_hops * hop]
    astep = jax.jit(make_audio_step(model, window, dft="mxu"),
                    donate_argnums=(1, 2))
    dsp = DspState(in_buf=jnp.zeros((5, hop), jnp.bfloat16),
                   ola_buf=jnp.zeros((5, hop), jnp.bfloat16))
    mstate = model.init_state(5, dtype=jnp.bfloat16)
    outs = []
    for t in range(0, max_hops, T_CHUNK):
        chunk = jnp.asarray(batch[:, hop * t : hop * (t + T_CHUNK)],
                            jnp.bfloat16)
        o, dsp, mstate = astep(bf16_params, dsp, mstate, chunk)
        outs.append(o.astype(jnp.float32))
    y = np.asarray(jnp.concatenate(outs, axis=-1))[:, hop:]
    paths["bf16 audio serving"] = {
        i: y[i - 1, : len(w)] for i, w in wavs.items()
    }

    # 16x8 PTQ (deploy calibration)
    calib = jnp.asarray(calibration_specs(WAV_DIR, n_wavs=32))
    qm16 = make_quantized_model(model, folded, calib, act_bits=16)
    f16 = jax.jit(qm16.apply)
    paths["16x8 PTQ"] = {
        i: enhance(lambda p, s: f16(p, s), folded, w)
        for i, w in wavs.items()
    }

    # full-int8 PTQ (deploy calibration)
    qm8 = make_quantized_model(model, folded, calib, act_bits=8)
    f8 = jax.jit(qm8.apply)
    paths["int8 PTQ"] = {
        i: enhance(lambda p, s: f8(p, s), folded, w)
        for i, w in wavs.items()
    }

    # full-int8 AdaRound+LSQ artifact
    if os.path.isdir(ar_dir):
        mgr = CheckpointManager(os.path.join(ar_dir, "checkpoints"))
        baked = mgr.restore(template={"params": folded})["params"]
        mgr.close()
        aqp = load_act_qp(os.path.join(ar_dir, "act_qp.npz"))

        def fwd_ar(p, s):
            ctx = Ctx()
            ctx.quant = FakeQuantizer(aqp)
            return model._forward(p, s, ctx)

        far = jax.jit(fwd_ar)
        paths["int8 AdaRound+LSQ"] = {
            i: enhance(lambda p, s: far(p, s), baked, w)
            for i, w in wavs.items()
        }

    # mixed 16/8 artifact (quant/mixed.py pipeline output: greedy-lifted
    # boundaries at int16, joint AdaRound reopt on the mixed grid)
    mx_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gtcrn_mixed"
    if os.path.exists(os.path.join(mx_dir, "baked.npz")):
        from gtcrn_micro_tpu.quant.mixed import _load_params_npz

        baked_m = _load_params_npz(folded, os.path.join(mx_dir, "baked.npz"))
        aqp_m = load_act_qp(os.path.join(mx_dir, "act_qp.npz"))

        def fwd_mx(p, s):
            ctx = Ctx()
            ctx.quant = FakeQuantizer(aqp_m)
            return model._forward(p, s, ctx)

        fmx = jax.jit(fwd_mx)
        paths["mixed 16/8 AdaRound"] = {
            i: enhance(lambda p, s: fmx(p, s), baked_m, w)
            for i, w in wavs.items()
        }

    print(f"{'path':24s} " + " ".join(f"n{i}" for i in range(1, 6))
          + "  mean")
    for name, outs in paths.items():
        scores = [pesq_wb(fp32[i], outs[i]) for i in range(1, 6)]
        print(f"{name:24s} " + " ".join(f"{s:.2f}" for s in scores)
              + f"  {np.mean(scores):.3f}", flush=True)


if __name__ == "__main__":
    main()
