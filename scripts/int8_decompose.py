"""Activation-vs-weight int8 error decomposition on noisy1 (folded graph)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
from gtcrn_micro_tpu.models.folding import fold_bn_params
from gtcrn_micro_tpu.eval.infer import load_params
from gtcrn_micro_tpu.nn.core import Ctx
from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
from gtcrn_micro_tpu.io.wav import read_wav
from gtcrn_micro_tpu.quant.fake_quant import fake_quant, weight_qparams
from gtcrn_micro_tpu.quant.ptq import FakeQuantizer
from gtcrn_micro_tpu.quant.qat import build_distill_corpus, calibrate_act_qparams, enhance_fp32
from gtcrn_micro_tpu.quant.parity import snr_db
from gtcrn_micro_tpu.utils.checkpoint import CheckpointManager

model = GTCRNMicro()
params = fold_bn_params(load_params("/root/reference/gtcrn_micro/ckpts/best_model_dns3.tar"))
wav_dir = "/root/reference/gtcrn_micro/examples/gtcrn_micro"
paths = [f"{wav_dir}/noisy{i}.wav" for i in (1,2,3,4)]
noisy, target = build_distill_corpus(model, params, paths)
from gtcrn_micro_tpu.quant.calibration import calibration_specs
from gtcrn_micro_tpu.quant.fake_quant import act_qparams
from gtcrn_micro_tpu.quant.ptq import observe_ranges as obs
calib = calibration_specs(wav_dir, n_wavs=32)
ranges = obs(model, params, jnp.asarray(calib), batch_size=4)
act_qp = {p: act_qparams(jnp.float32(lo), jnp.float32(hi), 8) for p, (lo, hi) in ranges.items()}

class ActsOnly(FakeQuantizer):
    def weight(self, ctx, leaf, w, axis): return w
class WeightsOnly(FakeQuantizer):
    def act(self, ctx, leaf, x): return x

def run(p, quant):
    wav, _ = read_wav(f"{wav_dir}/noisy1.wav")
    if wav.ndim > 1: wav = wav[:, 0]
    tgt = enhance_fp32(model, params, wav)
    window = sqrt_hann_window(model.config.win_len)
    spec = stft(jnp.asarray(wav, jnp.float32)[None], window)
    ctx = Ctx(); ctx.quant = quant
    out = jax.jit(lambda pp, s: model._forward(pp, s, Ctx_with(quant)))(p, spec) if False else None
    # simpler: eager
    ctx = Ctx(); ctx.quant = quant
    out = model._forward(p, spec, ctx)
    enh = np.asarray(istft(out, window, length=len(wav)))[0]
    return snr_db(tgt, enh)

print("acts-int8 / weights-fp32 ceiling:", round(run(params, ActsOnly(act_qp)), 1), "dB")
print("weights-int8-nearest / acts-fp32:", round(run(params, WeightsOnly(act_qp)), 1), "dB")
mgr = CheckpointManager("/tmp/gtcrn_adaround2/checkpoints")
baked = mgr.restore(template={"params": params})["params"]; mgr.close()
print("weights-adaround / acts-fp32:", round(run(baked, WeightsOnly(act_qp)), 1), "dB")
print("weights-adaround / acts-int8:", round(run(baked, FakeQuantizer(act_qp)), 1), "dB")
print("weights-int8-nearest / acts-int8:", round(run(params, FakeQuantizer(act_qp)), 1), "dB")

# --- r3 addendum: evaluate the AdaRound+LSQ artifact if present ----------
import os as _os
ART = "/tmp/gtcrn_adaround3"
if _os.path.isdir(ART):
    from gtcrn_micro_tpu.quant.adaround import load_act_qp
    lqp = load_act_qp(f"{ART}/act_qp.npz")
    mgr2 = CheckpointManager(f"{ART}/checkpoints")
    baked3 = mgr2.restore(template={"params": params})["params"]; mgr2.close()
    print("learned-scales acts-int8 / weights-fp32 ceiling:",
          round(run(params, ActsOnly(lqp)), 1), "dB")
    print("adaround3 weights / acts-fp32:",
          round(run(baked3, WeightsOnly(lqp)), 1), "dB")
    print("adaround3 full int8 (sim):",
          round(run(baked3, FakeQuantizer(lqp)), 1), "dB")
