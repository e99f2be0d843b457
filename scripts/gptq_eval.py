"""GPTQ vs nearest rounding on the deploy activation grids.

EVAL.md r4b finding: the GTM8 v3 artifact (w8 + a16 per-channel) is
WEIGHT-ROUNDING-bound — nearest w8 alone scores 29.8 dB held-out while the
a16-pc acts-only ceiling is 34.3 dB.  r4 also showed AdaRound's end-to-end
objective overfits (strictly negative on per-channel grids).  GPTQ
(quant/gptq.py) is the method in between: per-layer output reconstruction
on calibration data, no end-to-end co-adaptation.  This script measures
whether it recovers the rounding gap, on all four deploy grids.

Leak discipline: calibration (activation ranges AND the GPTQ Hessians)
uses noisy wavs 1-4 ONLY; noisy5 is the held-out wav and enters no
decision.  Note this is stricter than scripts/act_grid_perchannel.py
(which calibrated ranges on all 5) — the nearest baselines are therefore
re-measured here under the identical protocol.

Run: python scripts/gptq_eval.py  (CPU, ~30 min)
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

    model = GTCRNMicro()
    fp32 = fold_bn_params(load_params(CKPT))

    # calibration: wavs 1-4 only (noisy5 = held out of EVERY decision)
    calib_dir = tempfile.mkdtemp(prefix="gtcrn_gptq_calib_")
    for i in (1, 2, 3, 4):
        os.symlink(os.path.join(WAV_DIR, f"noisy{i}.wav"),
                   os.path.join(calib_dir, f"noisy{i}.wav"))
    calib = jnp.asarray(calibration_specs(calib_dir, n_wavs=4))
    print(f"# calib specs {calib.shape} from wavs 1-4", flush=True)

    r_pt = observe_ranges(model, fp32, calib, batch_size=4)
    r_pc = observe_ranges(model, fp32, calib, batch_size=4, per_channel=True)

    def qp_from(ranges, bits):
        return {
            p: act_qparams(jnp.asarray(lo, jnp.float32),
                           jnp.asarray(hi, jnp.float32), bits)
            for p, (lo, hi) in ranges.items()
        }

    grids = {
        "a16-pc": qp_from(r_pc, 16),
        "a8-pc": qp_from(r_pc, 8),
        "a16-pt": qp_from(r_pt, 16),
        "a8-pt": qp_from(r_pt, 8),
    }

    # act_qp rides as a jit ARGUMENT so nearest/gptq variants of one grid
    # share a compile (QParams is a registered pytree; bits/lanes change
    # the treedef or shapes -> one compile per grid)
    window = sqrt_hann_window(model.config.win_len)

    @jax.jit
    def _enh_q(params, spec, act_qp):
        ctx = Ctx()
        ctx.quant = FakeQuantizer(act_qp)
        return model._forward(params, spec, ctx)

    wavs = {}
    maxlen = 0
    for name in ("noisy1", "noisy5"):
        w, _ = read_wav(os.path.join(WAV_DIR, f"{name}.wav"))
        if w.ndim > 1:
            w = w[:, 0]
        wavs[name] = w
        maxlen = max(maxlen, len(w))
    # equal-length pad -> one compiled shape serves both wavs
    for name in wavs:
        wavs[name] = np.pad(wavs[name], (0, maxlen - len(wavs[name])))

    def enhance(params, wav, act_qp=None):
        spec = stft(jnp.asarray(wav, jnp.float32)[None], window)
        out = (model.apply_jit(params, spec) if act_qp is None
               else _enh_q(params, spec, act_qp))
        return np.asarray(istft(out, window, length=len(wav)))[0]

    def snr(ref, est):
        e = est - ref
        return 10 * np.log10(max(float((ref ** 2).sum()), 1e-20)
                             / max(float((e ** 2).sum()), 1e-20))

    targets = {n: enhance(fp32, w) for n, w in wavs.items()}

    print(f"{'grid':8s} {'rounding':8s} {'noisy1 (train src)':>20s} "
          f"{'noisy5 (HELD OUT)':>20s}", flush=True)
    for gname, act_qp in grids.items():
        t0 = time.time()
        baked = gptq_params(model, fp32, act_qp, calib)
        dt = time.time() - t0
        for rname, params in (("nearest", fp32), ("gptq", baked)):
            s = {n: snr(targets[n], enhance(params, w, act_qp))
                 for n, w in wavs.items()}
            extra = f"   (gptq {dt:.0f}s)" if rname == "gptq" else ""
            print(f"{gname:8s} {rname:8s} {s['noisy1']:19.1f}  "
                  f"{s['noisy5']:19.1f} {extra}", flush=True)


if __name__ == "__main__":
    main()
