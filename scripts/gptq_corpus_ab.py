"""GPTQ corpus-scaling A/B on the deployment grid (a16 per-channel).

scripts/gptq_eval.py measured GPTQ at −0.6 dB held-out vs nearest with
4-wav Hessians.  The r4 AdaRound isolation showed corpus scaling did NOT
fix end-to-end rounding overfit; this checks the same question for the
per-layer objective: Hessians from the 96-clip augmented corpus
(quant/qat.build_augmented_corpus — raw/noised/interference/gain/tone
clips from source wavs 1-3) vs the 4-wav deploy calibration.  Activation
grids are held fixed (deploy calibration on wavs 1-4) so ONLY the Hessian
data changes.  noisy5 stays out of every decision.

Run: python scripts/gptq_corpus_ab.py  (CPU, ~25 min)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

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


def main() -> None:
    from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
    from gtcrn_micro_tpu.eval.infer import load_params
    from gtcrn_micro_tpu.io.wav import read_wav
    from gtcrn_micro_tpu.models.folding import fold_bn_params
    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
    from gtcrn_micro_tpu.nn.core import Ctx
    from gtcrn_micro_tpu.quant.calibration import calibration_specs
    from gtcrn_micro_tpu.quant.fake_quant import act_qparams
    from gtcrn_micro_tpu.quant.gptq import gptq_params
    from gtcrn_micro_tpu.quant.ptq import FakeQuantizer, observe_ranges
    from gtcrn_micro_tpu.quant.qat import build_augmented_corpus

    model = GTCRNMicro()
    fp32 = fold_bn_params(load_params(CKPT))
    window = sqrt_hann_window(model.config.win_len)

    calib_dir = tempfile.mkdtemp(prefix="gtcrn_gptq_calib_")
    for i in (1, 2, 3, 4):
        os.symlink(os.path.join(WAV_DIR, f"noisy{i}.wav"),
                   os.path.join(calib_dir, f"noisy{i}.wav"))
    calib = jnp.asarray(calibration_specs(calib_dir, n_wavs=4))
    r_pc = observe_ranges(model, fp32, calib, batch_size=4, per_channel=True)
    act_qp = {
        p: act_qparams(jnp.asarray(lo, jnp.float32),
                       jnp.asarray(hi, jnp.float32), 16)
        for p, (lo, hi) in r_pc.items()
    }

    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    noisy_tr, _, _, _ = build_augmented_corpus(
        model, fp32, WAV_DIR, n_train=n_train, n_val=4)
    aug_specs = jnp.asarray(
        stft(jnp.asarray(noisy_tr, jnp.float32), window), jnp.float32)
    print(f"# hessian corpora: deploy {tuple(calib.shape)}, "
          f"augmented {tuple(aug_specs.shape)}", flush=True)

    @jax.jit
    def _enh_q(params, spec, qp):
        ctx = Ctx()
        ctx.quant = FakeQuantizer(qp)
        return model._forward(params, spec, ctx)

    wavs = {}
    maxlen = 0
    for name in ("noisy1", "noisy5"):
        w, _ = read_wav(os.path.join(WAV_DIR, f"{name}.wav"))
        if w.ndim > 1:
            w = w[:, 0]
        wavs[name] = w
        maxlen = max(maxlen, len(w))
    for name in wavs:
        wavs[name] = np.pad(wavs[name], (0, maxlen - len(wavs[name])))

    def enhance(params, wav, qp=None):
        spec = stft(jnp.asarray(wav, jnp.float32)[None], window)
        out = (model.apply_jit(params, spec) if qp is None
               else _enh_q(params, spec, qp))
        return np.asarray(istft(out, window, length=len(wav)))[0]

    def snr(ref, est):
        e = est - ref
        return 10 * np.log10(max(float((ref ** 2).sum()), 1e-20)
                             / max(float((e ** 2).sum()), 1e-20))

    targets = {n: enhance(fp32, w) for n, w in wavs.items()}

    rows = [("nearest", fp32)]
    for label, specs in (("gptq/deploy-4wav", calib),
                         (f"gptq/augmented-{n_train}", aug_specs)):
        t0 = time.time()
        rows.append((label, gptq_params(model, fp32, act_qp, specs)))
        print(f"# {label}: {time.time() - t0:.0f}s", flush=True)

    print(f"{'rounding':20s} {'noisy1 (train src)':>20s} "
          f"{'noisy5 (HELD OUT)':>20s}", flush=True)
    for label, params in rows:
        s = {n: snr(targets[n], enhance(params, w, act_qp))
             for n, w in wavs.items()}
        print(f"{label:20s} {s['noisy1']:19.1f}  {s['noisy5']:19.1f}",
              flush=True)


if __name__ == "__main__":
    main()
