"""Export the AdaRound artifact to GTM8 and bit-match the native engine.

VERDICT r2 #3's done-criterion: the optimized int8 model must ship as a
GTM8 artifact and the native engine must reproduce the JAX fake-quant
simulation on it.  This script:

1. loads the AdaRounded folded params + learned act scales (out_dir of
   quant/adaround.py),
2. exports the GTM8 (the exporter re-observes the per-channel weight
   scales -- identical to the sim's thanks to abs-max pinning),
3. enhances noisy1 via (a) the fp32 JAX pipeline, (b) the int8 fake-quant
   sim, (c) the native int8 engine on the artifact,
4. reports SNR(b vs a), SNR(c vs a) and the engine-vs-sim agreement.

Usage: python scripts/verify_adaround_artifact.py [art_dir] [native_bin]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
from gtcrn_micro_tpu.eval.infer import load_params
from gtcrn_micro_tpu.io.export_native import export_native_weights_int8
from gtcrn_micro_tpu.io.wav import read_wav, write_wav
from gtcrn_micro_tpu.models.folding import fold_bn_params
from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
from gtcrn_micro_tpu.nn.core import Ctx
from gtcrn_micro_tpu.quant.adaround import load_act_qp
from gtcrn_micro_tpu.quant.parity import snr_db
from gtcrn_micro_tpu.quant.ptq import FakeQuantizer
from gtcrn_micro_tpu.utils.checkpoint import CheckpointManager

CKPT = "/root/reference/gtcrn_micro/ckpts/best_model_dns3.tar"
WAV = "/root/reference/gtcrn_micro/examples/gtcrn_micro/noisy1.wav"


def main() -> None:
    art_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gtcrn_adaround4"
    native = (sys.argv[2] if len(sys.argv) > 2
              else "native/build/gtcrn_stream")

    model = GTCRNMicro()
    folded = fold_bn_params(load_params(CKPT))
    mgr = CheckpointManager(os.path.join(art_dir, "checkpoints"))
    baked = mgr.restore(template={"params": folded})["params"]
    mgr.close()
    act_qp = load_act_qp(os.path.join(art_dir, "act_qp.npz"))

    gtm8 = os.path.join(art_dir, "adaround.gtm8")
    n_tensors = export_native_weights_int8(baked, act_qp, gtm8)
    print(f"GTM8 exported: {gtm8} ({n_tensors} tensors, "
          f"{os.path.getsize(gtm8) / 1024:.0f} KB)", flush=True)

    wav, fs = read_wav(WAV)
    if wav.ndim > 1:
        wav = wav[:, 0]
    # round-trip through int16 FIRST so the sim and the native engine see
    # the IDENTICAL input samples (the engine reads an int16 wav; a
    # 1-quantum input difference flips int8 rounding decisions and would
    # masquerade as engine divergence)
    in_wav = os.path.join(art_dir, "noisy1_in.wav")
    write_wav(in_wav, wav, fs)
    wav, fs = read_wav(in_wav)
    window = sqrt_hann_window(model.config.win_len)
    spec = stft(jnp.asarray(wav, jnp.float32)[None], window)

    fp32 = np.asarray(
        istft(model.apply_jit(folded, spec), window, length=len(wav))
    )[0]

    ctx = Ctx()
    ctx.quant = FakeQuantizer(act_qp)
    sim_out = model._forward(baked, spec, ctx)
    sim = np.asarray(istft(sim_out, window, length=len(wav)))[0]
    print(f"int8 sim vs fp32: {snr_db(fp32, sim):.1f} dB", flush=True)

    out_wav = os.path.join(art_dir, "noisy1_native_int8.wav")
    subprocess.run([native, "--int8", gtm8, in_wav, out_wav], check=True)
    nat, _ = read_wav(out_wav)
    n = min(len(nat), len(fp32))
    print(f"native int8 vs fp32: {snr_db(fp32[:n], nat[:n]):.1f} dB",
          flush=True)
    print(f"native vs sim:       {snr_db(sim[:n], nat[:n]):.1f} dB "
          f"(int16-wav floor ~66 dB = bit-match)", flush=True)


if __name__ == "__main__":
    main()
