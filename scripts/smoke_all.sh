#!/bin/bash
# End-to-end smoke of every CLI surface on synthetic data (~10 min with a
# warm compile cache).  Exercises: data gen -> train -> resume -> infer
# (fp32 + int8) -> intrusive eval -> export -> native build + CLI -> bench
# helpers.  Exits non-zero on the first failure.
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

bash scripts/build_native.sh
./native/build/gtcrn_stream "$SMOKE/export/gtcrn_micro_weights.bin" \
  "$SMOKE/val/noisy/$(ls $SMOKE/val/noisy | head -1)" "$SMOKE/native_out.wav"

python -m gtcrn_micro_tpu.utils.complexity
python __graft_entry__.py 8
echo "ALL SMOKE SURFACES OK"
