"""Export model weights for the native C++ runtime.

Binary format (little-endian), consumed by native/gtcrn_micro.cc:

    magic   uint32  0x47544D31  ("GTM1")
    count   uint32  number of tensors
    per tensor:
        rank  uint32
        dims  uint32 x rank
        data  float32 x prod(dims)

Tensor order and layouts are EXACTLY ``ops.fused_step.pack_weights`` (BN
folded, deconv kernels canonicalised) -- one packing serves the Pallas
kernel, the layout-XLA path and the native runtime, so they cannot drift.

This is the counterpart of the reference's TFLite export for the ESP32/TFLM
runner (reference scripts/onnx2tf.sh -> esp32_s3/main/main.cc).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = 0x47544D31


def export_native_weights(params, path: str) -> int:
    """Serialize params (model pytree) to ``path``.  Returns tensor count."""
    from gtcrn_micro_tpu.ops.fused_step import pack_weights

    tensors = [np.asarray(w, np.float32) for w in pack_weights(params)]
    with open(path, "wb") as f:
        f.write(struct.pack("<II", MAGIC, len(tensors)))
        for t in tensors:
            f.write(struct.pack("<I", t.ndim))
            f.write(struct.pack(f"<{t.ndim}I", *t.shape))
            f.write(t.astype("<f4").tobytes())
    return len(tensors)


def load_native_weights(path: str) -> list[np.ndarray]:
    """Read a native weights file back (round-trip testing)."""
    out = []
    with open(path, "rb") as f:
        magic, count = struct.unpack("<II", f.read(8))
        assert magic == MAGIC, f"bad magic {magic:#x}"
        for _ in range(count):
            (rank,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{rank}I", f.read(4 * rank))
            n = int(np.prod(dims)) if dims else 1
            data = np.frombuffer(f.read(4 * n), "<f4")
            out.append(data.reshape(dims))
    return out
