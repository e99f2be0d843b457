import sys, numpy as np, jax, jax.numpy as jnp
tag = sys.argv[1]
if tag == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/gtcrn_micro_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from gtcrn_micro_tpu.eval.infer import load_params
from gtcrn_micro_tpu.models.folding import fold_bn_params
from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
from gtcrn_micro_tpu.quant.calibration import calibration_specs
from gtcrn_micro_tpu.quant.fake_quant import act_qparams
from gtcrn_micro_tpu.quant.ptq import observe_ranges
model = GTCRNMicro()
folded = fold_bn_params(load_params("/root/reference/gtcrn_micro/ckpts/best_model_dns3.tar"))
calib = jnp.asarray(calibration_specs("/tmp/calib_cli", n_wavs=32))
ranges = observe_ranges(model, folded, calib, batch_size=4, per_channel=True)
act_qp = {p: act_qparams(jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32), 16)
          for p, (lo, hi) in ranges.items()}
from gtcrn_micro_tpu.quant.gptq import augmented_hessian_specs, capture_boundaries
specs = augmented_hessian_specs(model, folded, "/tmp/calib_cli", n_clips=8)
probe = capture_boundaries(model, folded, act_qp, specs[:2, :, :33])
rec = next(r for r in probe if r.path == "sfe/depth_conv/w")
np.savez(f"/tmp/rec_{tag}.npz", x=np.asarray(rec.x), out=np.asarray(rec.out) if hasattr(rec, 'out') else np.zeros(1),
         w=np.asarray(rec.w), specs=np.asarray(specs[:2, :, :33]))
print("dumped", tag, flush=True)
