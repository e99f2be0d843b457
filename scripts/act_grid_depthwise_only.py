"""Hybrid act grid: per-channel scales at DEPTHWISE boundaries only.

Engine-cost analysis (native/gtcrn_micro_q.cc): a per-channel scale on a
depthwise conv's input needs NO weight folding -- channels don't mix, so
``rescale[c] = in.scale[c] * w.scale[c]`` and the integer MAC is
unchanged; only the requant sites become per-lane.  Per-channel scales
on MIXING (pointwise/full) conv inputs require folding the input scales
into the quantized weights at export, which breaks the bit-match oracle
between the native engine and the JAX fake-quant sim.

This measures what the CHEAP subset buys: per-channel act scales at the
depthwise-input boundaries (sfe, encoder GTConv depth convs, all TCN
conv2), per-tensor everywhere else.  Compare with the full per-channel
rows from scripts/act_grid_perchannel.py.

Run: python scripts/act_grid_depthwise_only.py
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


def is_depthwise_input(path: str) -> bool:
    """Quant paths whose conv is depthwise (groups == channels):
    SFE's freq conv, ENCODER GTConv depth convs (decoder's use deconv
    with groups=1), and every TCN conv2 (nn/blocks.py)."""
    if path.endswith("conv2/in") and ("gtcn" in path or "tcn" in path):
        return True
    if "sfe" in path and path.endswith("/in"):
        return True
    return "encoder/" in path and path.endswith("depth_conv/in")


def main() -> None:
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
    from gtcrn_micro_tpu.quant.ptq import FakeQuantizer, observe_ranges

    model = GTCRNMicro()
    fp32 = fold_bn_params(load_params(CKPT))

    calib_dir = tempfile.mkdtemp(prefix="gtcrn_calib_")
    for f in sorted(os.listdir(WAV_DIR)):
        if f.startswith("noisy") and f.endswith(".wav"):
            os.symlink(os.path.join(WAV_DIR, f), os.path.join(calib_dir, f))
    calib = jnp.asarray(calibration_specs(calib_dir, n_wavs=32))

    r_pt = observe_ranges(model, fp32, calib, batch_size=4)
    r_pc = observe_ranges(model, fp32, calib, batch_size=4, per_channel=True)
    dw = sorted(p for p in r_pt if is_depthwise_input(p))
    print(f"# {len(dw)}/{len(r_pt)} depthwise-input boundaries:", flush=True)
    for p in dw:
        print(f"#   {p}", flush=True)

    def qp_hybrid(bits):
        return {
            p: act_qparams(
                jnp.asarray(r_pc[p][0] if p in dw else r_pt[p][0], jnp.float32),
                jnp.asarray(r_pc[p][1] if p in dw else r_pt[p][1], jnp.float32),
                bits)
            for p in r_pt
        }

    def qp_from(ranges, bits):
        return {
            p: act_qparams(jnp.asarray(lo, jnp.float32),
                           jnp.asarray(hi, jnp.float32), bits)
            for p, (lo, hi) in ranges.items()
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
        "w8+a8 per-tensor": FakeQuantizer(qp_from(r_pt, 8)),
        "w8+a8 pc@depthwise": FakeQuantizer(qp_hybrid(8)),
        "w8+a8 pc@all": FakeQuantizer(qp_from(r_pc, 8)),
        "w8+a16 per-tensor": FakeQuantizer(qp_from(r_pt, 16)),
        "w8+a16 pc@depthwise": FakeQuantizer(qp_hybrid(16)),
        "w8+a16 pc@all": FakeQuantizer(qp_from(r_pc, 16)),
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
            print(f"  {name:24s} {snr(target, got):6.1f} dB", flush=True)


if __name__ == "__main__":
    main()
