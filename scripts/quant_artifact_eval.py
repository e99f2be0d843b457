"""End-to-end GTM8 v3 artifact quality under a CONTROLLED calibration set.

Exports the per-channel native artifact (optionally with GPTQ weight
rounding, quant/gptq.py) calibrated ONLY on --calib_wavs, runs the native
PC engine (native/gtcrn_micro_pc.cc) on noisy1 (train-source) and noisy5
(held out), and scores SNR vs the native fp32 engine — the same
stream-aligned protocol behind EVAL.md's realized-artifact numbers.

This script exists because the original r4b artifact measurement
calibrated on ALL noisy wavs (noisy5 included), so its "held-out" number
was partially self-calibrated (EVAL.md r4c).  Default here: wavs 1-4,
noisy5 in no decision.

Run: python scripts/quant_artifact_eval.py [--gptq] [--calib_wavs 1,2,3,4]
(CPU; ~4 min export + native run, +~20 min with --gptq)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/gtcrn_micro_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

WAV_DIR = "/root/reference/gtcrn_micro/examples/gtcrn_micro"
CKPT = "/root/reference/gtcrn_micro/ckpts/best_model_dns3.tar"
BIN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "native", "build", "gtcrn_stream")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--calib_wavs", default="1,2,3,4")
    parser.add_argument("--act_bits", type=int, default=16, choices=(8, 16))
    parser.add_argument("--gptq", action="store_true")
    parser.add_argument("--gptq_clips", type=int, default=96)
    ns = parser.parse_args()

    from gtcrn_micro_tpu.eval.infer import load_params
    from gtcrn_micro_tpu.io.export_native import (
        export_native_weights,
        export_native_weights_int8,
    )
    from gtcrn_micro_tpu.io.wav import read_wav
    from gtcrn_micro_tpu.models.folding import fold_bn_params
    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
    from gtcrn_micro_tpu.quant.calibration import calibration_specs
    from gtcrn_micro_tpu.quant.fake_quant import act_qparams
    from gtcrn_micro_tpu.quant.ptq import observe_ranges

    model = GTCRNMicro()
    folded = fold_bn_params(load_params(CKPT))

    calib_dir = tempfile.mkdtemp(prefix="gtcrn_calib_")
    for i in (int(s) for s in ns.calib_wavs.split(",")):
        os.symlink(os.path.join(WAV_DIR, f"noisy{i}.wav"),
                   os.path.join(calib_dir, f"noisy{i}.wav"))
    calib = jnp.asarray(calibration_specs(calib_dir, n_wavs=32))
    print(f"# calibration: noisy{{{ns.calib_wavs}}} -> {tuple(calib.shape)}",
          flush=True)
    ranges = observe_ranges(model, folded, calib, batch_size=4,
                            per_channel=True)
    act_qp = {
        p: act_qparams(jnp.asarray(lo, jnp.float32),
                       jnp.asarray(hi, jnp.float32), ns.act_bits)
        for p, (lo, hi) in ranges.items()
    }
    if ns.gptq:
        from gtcrn_micro_tpu.quant.gptq import (
            augmented_hessian_specs,
            gptq_params,
        )

        hspecs = augmented_hessian_specs(model, folded, calib_dir,
                                         n_clips=ns.gptq_clips)
        print(f"# gptq: hessian corpus {tuple(hspecs.shape)}", flush=True)
        folded = gptq_params(model, folded, act_qp, hspecs)

    out_dir = tempfile.mkdtemp(prefix="gtcrn_artifact_")
    gtm8 = os.path.join(out_dir, "gtm8_v3.bin")
    gtm1 = os.path.join(out_dir, "gtm1_fp32.bin")
    export_native_weights_int8(folded, act_qp, gtm8)
    export_native_weights(fold_bn_params(load_params(CKPT)), gtm1)
    print(f"# artifacts in {out_dir}", flush=True)

    def run(flags, weights, wav_in, wav_out):
        subprocess.run([BIN, *flags, weights, wav_in, wav_out],
                       check=True, capture_output=True)
        w, _ = read_wav(wav_out)
        return w[:, 0] if w.ndim > 1 else w

    print(f"{'wav':8s} {'native a%d-pc%s vs fp32 engine' % (ns.act_bits, '+gptq' if ns.gptq else ''):>34s}",
          flush=True)
    for name in ("noisy1", "noisy5"):
        src = os.path.join(WAV_DIR, f"{name}.wav")
        ref = run([], gtm1, src, os.path.join(out_dir, f"{name}_fp32.wav"))
        est = run(["--pc"], gtm8, src, os.path.join(out_dir, f"{name}_pc.wav"))
        n = min(len(ref), len(est))
        e = est[:n] - ref[:n]
        snr = 10 * np.log10(max(float((ref[:n] ** 2).sum()), 1e-20)
                            / max(float((e ** 2).sum()), 1e-20))
        tag = "train source" if name == "noisy1" else "HELD OUT"
        print(f"{name:8s} {snr:20.1f} dB   ({tag})", flush=True)


if __name__ == "__main__":
    main()
