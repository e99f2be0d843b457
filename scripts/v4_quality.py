"""GTM8 v4 quality: what does full-INTEGER execution cost the per-channel grid?

The v4 engine (native/gtcrn_micro_v4.cc) runs the per-channel-activation
grid on pure integer MACs by quantizing every weight on its act-scale-FOLDED
tensor at export (io/export_native.py integer_pc=True).  The fold widens the
per-out-channel weight dynamic range (each in-lane is scaled by its own
s_in), so the int8 weight grid gets coarser exactly where lane scales
spread -- this script measures that cost against the v3 fp32-MAC numbers
under the leak-clean r4c protocol (calibrate on noisy1-4, hold out noisy5;
EVAL.md r4c).

Rows: v3 sim (FakeQuantizer) vs v4 sim (FakeQuantizerV4) on the a16-pc and
a8-pc grids, dB vs the fp32 pipeline on noisy1 (train-source) and noisy5
(held out).

Run: python scripts/v4_quality.py [--calib_wavs 1,2,3,4]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

WAV_DIR = "/root/reference/gtcrn_micro/examples/gtcrn_micro"
CKPT = "/root/reference/gtcrn_micro/ckpts/best_model_dns3.tar"


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--calib_wavs", default="1,2,3,4")
    parser.add_argument("--cpu", action="store_true",
                        help="pin the CPU backend (safe while a TPU job runs)")
    ns = parser.parse_args()
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")
    calib_ids = [int(s) for s in ns.calib_wavs.split(",")]

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
    from gtcrn_micro_tpu.eval.infer import load_params
    from gtcrn_micro_tpu.io.wav import read_wav
    from gtcrn_micro_tpu.models.folding import fold_bn_params
    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
    from gtcrn_micro_tpu.nn.core import Ctx
    from gtcrn_micro_tpu.quant.calibration import calibration_specs
    from gtcrn_micro_tpu.quant.fake_quant import act_qparams
    from gtcrn_micro_tpu.quant.ptq import (
        FakeQuantizer,
        FakeQuantizerV4,
        observe_ranges,
    )

    model = GTCRNMicro()
    fp32 = fold_bn_params(load_params(CKPT))

    calib_dir = tempfile.mkdtemp(prefix="gtcrn_calib_")
    for i in calib_ids:
        os.symlink(os.path.join(WAV_DIR, f"noisy{i}.wav"),
                   os.path.join(calib_dir, f"noisy{i}.wav"))
    calib = jnp.asarray(calibration_specs(calib_dir, n_wavs=32))
    print(f"# calibration wavs: noisy{{{ns.calib_wavs}}} "
          f"-> specs {tuple(calib.shape)}", flush=True)

    r_pc = observe_ranges(model, fp32, calib, batch_size=4, per_channel=True)

    def qp_from(bits):
        return {
            p: act_qparams(jnp.asarray(lo, jnp.float32),
                           jnp.asarray(hi, jnp.float32), bits)
            for p, (lo, hi) in r_pc.items()
        }

    window = sqrt_hann_window(model.config.win_len)

    def enhance(params, wav, quantizer=None):
        spec = stft(jnp.asarray(wav, jnp.float32)[None], window)
        ctx = Ctx()
        ctx.quant = quantizer
        out = jax.jit(lambda p, s: model._forward(p, s, ctx))(params, spec)
        return np.asarray(istft(out, window, length=len(wav)))[0]

    def snr(ref, est):
        e = est - ref
        return 10 * np.log10(
            max(float((ref**2).sum()), 1e-20)
            / max(float((e**2).sum()), 1e-20)
        )

    rows = {
        "w8+a16 pc v3 (fp32 MACs)": FakeQuantizer(qp_from(16)),
        "w8+a16 pc v4 (integer MACs)": FakeQuantizerV4(qp_from(16)),
        "w8+a8  pc v3 (fp32 MACs)": FakeQuantizer(qp_from(8)),
        "w8+a8  pc v4 (integer MACs)": FakeQuantizerV4(qp_from(8)),
    }
    for wav_name in ("noisy1", "noisy5"):
        wav, _ = read_wav(os.path.join(WAV_DIR, f"{wav_name}.wav"))
        if wav.ndim > 1:
            wav = wav[:, 0]
        target = enhance(fp32, wav)
        print(f"== {wav_name} "
              f"({'train source' if wav_name == 'noisy1' else 'HELD OUT'})",
              flush=True)
        for name, q in rows.items():
            got = enhance(fp32, wav, q)
            print(f"  {name:30s} {snr(target, got):6.1f} dB", flush=True)


if __name__ == "__main__":
    main()
