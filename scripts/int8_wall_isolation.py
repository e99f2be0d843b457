"""Isolate WHAT limits full-int8 held-out quality: weights or activations.

r4 finding to explain: scaling the AdaRound distillation corpus 56 -> 384
diverse clips with disjoint-source early stopping moved held-out SNR only
18.0 -> 17.4 dB (i.e. corpus size was NOT the binding constraint), while
the proxy-val (unseen-source) score plateaued at ~14.5 dB.  This script
ablates the SAME shipped AdaRound artifact four ways on the train wav and
the held-out wav:

  w8+a8   baked int8 weights + int8 activation grid  (the full artifact)
  w8      baked int8 weights, activations fp32        (weights' own damage)
  a8      fp32 weights, int8 activation grid          (grid's own damage)
  w8+a16  baked int8 weights + int16 activation grid  (the 16x8 mode)

If w8 alone holds high SNR on the held-out wav while a8 alone collapses to
~the full artifact's score, the activation grid -- not weight rounding,
not the corpus -- is the wall.

Run: python scripts/int8_wall_isolation.py [--art /tmp/gtcrn_adaround_r4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

WAV_DIR = "/root/reference/gtcrn_micro/examples/gtcrn_micro"
CKPT = "/root/reference/gtcrn_micro/ckpts/best_model_dns3.tar"


def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    ap = argparse.ArgumentParser()
    ap.add_argument("--art", default="/tmp/gtcrn_adaround_r4")
    ns = ap.parse_args()

    from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
    from gtcrn_micro_tpu.eval.infer import load_params
    from gtcrn_micro_tpu.io.wav import read_wav
    from gtcrn_micro_tpu.models.folding import fold_bn_params
    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
    from gtcrn_micro_tpu.nn.core import Ctx
    from gtcrn_micro_tpu.quant.adaround import load_act_qp
    from gtcrn_micro_tpu.quant.calibration import calibration_specs
    from gtcrn_micro_tpu.quant.fake_quant import act_qparams
    from gtcrn_micro_tpu.quant.ptq import FakeQuantizer, observe_ranges
    from gtcrn_micro_tpu.utils.checkpoint import CheckpointManager

    model = GTCRNMicro()
    fp32 = fold_bn_params(load_params(CKPT))
    mgr = CheckpointManager(os.path.join(ns.art, "checkpoints"))
    baked = mgr.restore(template={"params": fp32})["params"]
    mgr.close()
    act_qp8 = load_act_qp(os.path.join(ns.art, "act_qp.npz"))

    # int16 activation grid from the same deploy-calibration protocol
    import tempfile

    calib_dir = tempfile.mkdtemp(prefix="gtcrn_calib_")
    for f in sorted(os.listdir(WAV_DIR)):
        if f.startswith("noisy") and f.endswith(".wav"):
            os.symlink(os.path.join(WAV_DIR, f), os.path.join(calib_dir, f))
    calib = jnp.asarray(calibration_specs(calib_dir, n_wavs=32))
    ranges = observe_ranges(model, fp32, calib, batch_size=4)
    act_qp16 = {
        p: act_qparams(jnp.float32(lo), jnp.float32(hi), 16)
        for p, (lo, hi) in ranges.items()
    }

    class ActOnly(FakeQuantizer):
        """Quantize activations only; weights pass through untouched."""

        def weight(self, ctx, leaf, w, channel_axis):  # noqa: ARG002
            return w

    class WeightOnly(FakeQuantizer):
        """Nearest-round weights to the int8 grid; activations fp32."""

        def act(self, ctx, leaf, x):  # noqa: ARG002
            return x

    # splice trees to separate the learned ROUNDING from the co-trained
    # FLOAT terms (biases / BN beta, TRAINABLE_FLOAT_LEAVES)
    from gtcrn_micro_tpu.quant.adaround import TRAINABLE_FLOAT_LEAVES

    def splice(weight_src, float_src):
        def pick(path, wv, fv):
            leaf = jax.tree_util.keystr(path, simple=True,
                                        separator="/").rsplit("/", 1)[-1]
            return fv if leaf in TRAINABLE_FLOAT_LEAVES else wv

        return jax.tree_util.tree_map_with_path(pick, weight_src, float_src)

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
        "w8+a8 (full artifact)": (baked, FakeQuantizer(act_qp8)),
        "w8 only (acts fp32)": (baked, None),
        "a8 only (weights fp32)": (fp32, ActOnly(act_qp8)),
        "w8+a16 (16x8 grid)": (baked, FakeQuantizer(act_qp16)),
        "a16 only (weights fp32)": (fp32, ActOnly(act_qp16)),
        # decompose the baked artifact: learned rounding vs float terms
        "w8-nearest (PTQ rounding)": (fp32, WeightOnly(act_qp8)),
        "w8-nearest + a8 (PTQ int8)": (fp32, FakeQuantizer(act_qp8)),
        "w8-nearest + a16 (16x8 art.)": (fp32, FakeQuantizer(act_qp16)),
        "w8-rounding, ckpt floats": (splice(baked, fp32), None),
        "ckpt weights, trained floats": (splice(fp32, baked), None),
    }
    for wav_name in ("noisy1", "noisy5"):
        wav, _ = read_wav(os.path.join(WAV_DIR, f"{wav_name}.wav"))
        if wav.ndim > 1:
            wav = wav[:, 0]
        target = enhance(fp32, wav)  # fp32 pipeline = the quality reference
        print(f"== {wav_name} "
              f"({'train source' if wav_name == 'noisy1' else 'HELD OUT'})",
              flush=True)
        for name, (p, q) in rows.items():
            got = enhance(p, wav, q)
            print(f"  {name:26s} {snr(target, got):6.1f} dB", flush=True)


if __name__ == "__main__":
    main()
