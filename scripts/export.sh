#!/bin/bash
# Export deployment artifacts: StableHLO graphs + native weights binary
# (the reference's stream_onnx + onnx2tf analog).
set -euo pipefail
CKPT="${1:?usage: export.sh <checkpoint> [out_dir]}"
OUT="${2:-export}"
python -m gtcrn_micro_tpu.io.export_stablehlo --checkpoint "$CKPT" --out_dir "$OUT"
