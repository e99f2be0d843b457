#!/bin/bash
# End-to-end smoke of every CLI surface on synthetic data (~10 min with a
# warm compile cache).  Exercises: data gen -> train -> resume -> infer
# (fp32 + int8) -> intrusive eval -> export (stablehlo + onnx + native,
# GTM8 int8/16x8) -> native build + fp32/int8/16x8/bench CLIs -> driver
# entry.  Exits non-zero on the first failure.
set -euo pipefail
cd "$(dirname "$0")/.."

SMOKE=/tmp/gtcrn_micro_tpu_smoke
rm -rf "$SMOKE"
python -m gtcrn_micro_tpu.utils.make_smoke_data

python -m gtcrn_micro_tpu.train.train -C configs/smoke.yaml
EXP=$(ls -dt $SMOKE/exp_* | head -1)

python - <<PY
import yaml
cfg = {
  'test_dataset': {'noisy_dir': '$SMOKE/val/noisy', 'clean_dir': '$SMOKE/val/clean'},
  'network': {'checkpoint': '$EXP/checkpoints/best', 'enh_folder': '$SMOKE/enhanced'},
  'network_config': {'n_fft': 512, 'hop_len': 256, 'win_len': 512},
}
yaml.safe_dump(cfg, open('$SMOKE/cfg_infer.yaml', 'w'))
PY

python -m gtcrn_micro_tpu.eval.infer -C "$SMOKE/cfg_infer.yaml"
python -m gtcrn_micro_tpu.eval.infer -C "$SMOKE/cfg_infer.yaml" --quant --act_bits 16
python -m gtcrn_micro_tpu.eval.evaluate -C "$SMOKE/cfg_infer.yaml" --metric intrusive --nj 2
test -f "$SMOKE/enhanced/RESULTS_intrusive/RESULTS.txt"

python -m gtcrn_micro_tpu.io.export_stablehlo \
  --checkpoint "$EXP/checkpoints/best" --out_dir "$SMOKE/export" --frames 8
test -f "$SMOKE/export/gtcrn_micro_weights.bin"
test -f "$SMOKE/export/gtcrn_micro.onnx"
test -f "$SMOKE/export/gtcrn_micro_stream.onnx"

python - <<PY
# emitted ONNX re-executes through the in-repo interpreter
import numpy as np
from gtcrn_micro_tpu.io.onnx import OnnxModel
om = OnnxModel("$SMOKE/export/gtcrn_micro.onnx")
out = om(np.zeros((1, 257, 8, 2), np.float32))[0]
assert out.shape == (1, 257, 8, 2) and np.isfinite(out).all()
print("onnx round-trip ok")
PY

python - <<PY
# quantized GTM8 artifacts (int8 + 16x8) from the smoke checkpoint
import numpy as np, jax.numpy as jnp
from gtcrn_micro_tpu.eval.infer import load_params
from gtcrn_micro_tpu.models import GTCRNMicro
from gtcrn_micro_tpu.models.folding import fold_bn_params
from gtcrn_micro_tpu.quant.fake_quant import act_qparams
from gtcrn_micro_tpu.quant.ptq import observe_ranges
from gtcrn_micro_tpu.quant.calibration import calibration_specs
from gtcrn_micro_tpu.io.export_native import export_native_weights_int8
model = GTCRNMicro()
folded = fold_bn_params(load_params("$EXP/checkpoints/best"))
calib = jnp.asarray(calibration_specs("$SMOKE/val/noisy", n_wavs=4, max_frames=64))
ranges = observe_ranges(model, folded, calib, batch_size=4)
for bits, name in ((8, "w_int8.bin"), (16, "w_16x8.bin")):
    qp = {p: act_qparams(jnp.float32(lo), jnp.float32(hi), bits)
          for p, (lo, hi) in ranges.items()}
    export_native_weights_int8(folded, qp, f"$SMOKE/export/{name}")
print("GTM8 artifacts ok")
PY

# one-shot calibrated GTM8 v3 export through the CLI (r4b)
python -m gtcrn_micro_tpu.io.export_stablehlo \
  --checkpoint "$EXP/checkpoints/best" --out_dir "$SMOKE/export" \
  --format native-int8 --calib_dir "$SMOKE/val/noisy" \
  --act_bits 16 --per_channel_acts
test -f "$SMOKE/export/gtcrn_micro_w8a16_pc.bin"

bash scripts/build_native.sh
NOISY="$SMOKE/val/noisy/$(ls $SMOKE/val/noisy | head -1)"
./native/build/gtcrn_stream "$SMOKE/export/gtcrn_micro_weights.bin" \
  "$NOISY" "$SMOKE/native_out.wav"
./native/build/gtcrn_stream --int8 "$SMOKE/export/w_int8.bin" \
  "$NOISY" "$SMOKE/native_out_int8.wav"
./native/build/gtcrn_stream --int16 "$SMOKE/export/w_16x8.bin" \
  "$NOISY" "$SMOKE/native_out_16x8.wav"
./native/build/gtcrn_stream --pc "$SMOKE/export/gtcrn_micro_w8a16_pc.bin" \
  "$NOISY" "$SMOKE/native_out_pc.wav"
./native/build/gtcrn_stream --bench "$SMOKE/export/gtcrn_micro_weights.bin" 4

python -m gtcrn_micro_tpu.utils.complexity
python -m gtcrn_micro_tpu.serve --wav "$NOISY" --checkpoint \
  "$EXP/checkpoints/best" --out "$SMOKE/serve_demo.wav" --dtype f32
python __graft_entry__.py 8
echo "ALL SMOKE SURFACES OK"
