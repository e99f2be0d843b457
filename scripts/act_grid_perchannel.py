"""Does a PER-CHANNEL int8 activation grid break the ~17 dB held-out wall?

r4 isolation (scripts/int8_wall_isolation.py, EVAL.md): static PER-TENSOR
int8 activations bound held-out full-int8 at ~17 dB -- the a8 grid with
perfect fp32 weights reaches only 10-17 dB held-out, and no weight-side
method can recover what the grid destroys.  The suspected mechanism is
per-path dynamic-range spread ACROSS CHANNELS (TRA gates + decoder, the
r2 sensitivity finding): one shared scale wastes most of the 256 levels
on the hottest channel.

This script measures the same acts-only / weights+acts ablations with
minor-axis (per-channel) activation scales from the SAME deploy
calibration protocol (noisy wavs, p99.99).  Rows print train-source
(noisy1) and held-out (noisy5) SNR vs the fp32 pipeline, comparable to
EVAL.md's r4 table.

Deployability note: a per-channel scale on a conv INPUT folds into that
conv's weights (w~[oc, ic] = w[oc, ic] * s_ic before per-oc weight
quantization), so the integer MAC kernel is unchanged; per-channel scales
on SPATIAL minor axes (the F axis at io boundaries) and on nonlinearity
inputs need per-lane requant instead.  This experiment quantifies the
quality headroom before any such engine work.

Calibration protocol (r4c correction): by default the held-out wav
(noisy5) is EXCLUDED from calibration — the original r4b run symlinked
every noisy*.wav, so noisy5's own activation ranges leaked into the
grids it was then scored on, inflating the "held-out" a16-pc rows by
~3-4 dB (EVAL.md r4c).  `--calib_wavs 1,2,3,4,5` reproduces the
self-calibrated deployment mode (calibrate on the audio you are about to
enhance — legitimate in deployment, but not a held-out number).

Run: python scripts/act_grid_perchannel.py [--calib_wavs 1,2,3,4]
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
    parser.add_argument("--calib_wavs", default="1,2,3,4",
                        help="comma-separated noisy wav ids used for "
                             "activation calibration (default excludes the "
                             "held-out noisy5)")
    ns = parser.parse_args()
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
    from gtcrn_micro_tpu.quant.ptq import FakeQuantizer, observe_ranges

    model = GTCRNMicro()
    fp32 = fold_bn_params(load_params(CKPT))

    calib_dir = tempfile.mkdtemp(prefix="gtcrn_calib_")
    for i in calib_ids:
        os.symlink(os.path.join(WAV_DIR, f"noisy{i}.wav"),
                   os.path.join(calib_dir, f"noisy{i}.wav"))
    calib = jnp.asarray(calibration_specs(calib_dir, n_wavs=32))
    print(f"# calibration wavs: noisy{{{ns.calib_wavs}}} "
          f"-> specs {tuple(calib.shape)}", flush=True)

    def qp_from(ranges, bits):
        return {
            p: act_qparams(jnp.asarray(lo, jnp.float32),
                           jnp.asarray(hi, jnp.float32), bits)
            for p, (lo, hi) in ranges.items()
        }

    r_pt = observe_ranges(model, fp32, calib, batch_size=4)
    r_pc = observe_ranges(model, fp32, calib, batch_size=4, per_channel=True)
    n_lanes = {p: int(np.size(hi)) for p, (_, hi) in r_pc.items()}
    spread = {
        p: float((np.asarray(hi) - np.asarray(lo)).max()
                 / max(float((np.asarray(hi) - np.asarray(lo)).min()), 1e-12))
        for p, (lo, hi) in r_pc.items()
    }
    worst = sorted(spread.items(), key=lambda kv: -kv[1])[:8]
    print("# largest per-path channel range spreads (max/min lane range):",
          flush=True)
    for p, s in worst:
        print(f"#   {p}: {s:8.1f}x over {n_lanes[p]} lanes", flush=True)

    class ActOnly(FakeQuantizer):
        def weight(self, ctx, leaf, w, channel_axis):  # noqa: ARG002
            return w

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
        "a8 per-tensor (acts only)": (fp32, ActOnly(qp_from(r_pt, 8))),
        "a8 per-channel (acts only)": (fp32, ActOnly(qp_from(r_pc, 8))),
        "w8+a8 per-tensor (PTQ int8)": (fp32, FakeQuantizer(qp_from(r_pt, 8))),
        "w8+a8 per-channel": (fp32, FakeQuantizer(qp_from(r_pc, 8))),
        "a16 per-tensor (acts only)": (fp32, ActOnly(qp_from(r_pt, 16))),
        "a16 per-channel (acts only)": (fp32, ActOnly(qp_from(r_pc, 16))),
        "w8+a16 per-channel": (fp32, FakeQuantizer(qp_from(r_pc, 16))),
    }
    for wav_name in ("noisy1", "noisy5"):
        wav, _ = read_wav(os.path.join(WAV_DIR, f"{wav_name}.wav"))
        if wav.ndim > 1:
            wav = wav[:, 0]
        target = enhance(fp32, wav)
        print(f"== {wav_name} "
              f"({'train source' if wav_name == 'noisy1' else 'HELD OUT'})",
              flush=True)
        for name, (p, q) in rows.items():
            got = enhance(p, wav, q)
            print(f"  {name:30s} {snr(target, got):6.1f} dB", flush=True)


if __name__ == "__main__":
    main()
