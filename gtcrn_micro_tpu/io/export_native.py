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


# ---------------------------------------------------------------------------
# GTM8: full-integer int8 artifact (the reference's deployment format --
# full-integer .tflite via onnx2tf -oiqt, scripts/onnx2tf.sh:50-64)
# ---------------------------------------------------------------------------

MAGIC_INT8 = 0x47544D38  # "GTM8"

# Per-slot quantization: None = keep fp32, int = per-channel axis in the
# PACKED layout (pack_weights order).  Biases/alphas and the frozen ERB
# filterbank stay fp32.
_GT_SLOT_AXES = [0, None, None, None, None, None, 0, None, 1, None, 0, None]
_GT_DW_AXIS_IDX = 3  # dw_w slot position inside a GTConv group
_TCN_SLOT_AXES = [0, None, None, 1, None, None, 0, None, None]


def _slot_axes() -> list:
    """Channel axis per pack_weights slot (158 entries)."""
    axes: list = [None, None, 1]  # bm, bs, sfe (3, c, 1, 1) -> axis 1
    for _ in ("en0", "en1"):
        axes += [1, None, None]  # w (5, Co, Ci) -> axis 1
    for _ in range(3):  # encoder GTConv: dw (kt*kf, C, 1, 1) -> axis 1
        gt = list(_GT_SLOT_AXES)
        gt[_GT_DW_AXIS_IDX] = 1
        axes += gt
    for _ in range(8):
        axes += _TCN_SLOT_AXES
    for _ in range(3):  # decoder GTConv: dw (kt, kf, Co, Ci) -> axis 2
        gt = list(_GT_SLOT_AXES)
        gt[_GT_DW_AXIS_IDX] = 2
        axes += gt
    axes += [1, None, None]  # de3
    axes += [1, None]  # de4
    return axes


def act_path_order() -> list[str]:
    """The 59 activation-quant boundaries in graph traversal order == the
    order the native int8 engine consumes them (native/gtcrn_micro_q.cc
    WeightsQ::Load)."""
    gt = ("pw1/in", "depth_conv/in", "pw2/in", "tra/energy", "tra/gate_in")
    order = ["sfe/depth_conv/in", "encoder/en0/conv/in", "encoder/en1/conv/in"]
    for n in ("en2", "en3", "en4"):
        order += [f"encoder/{n}/{x}" for x in gt]
    for s in ("gtcn1", "gtcn2"):
        for j in range(4):
            order += [f"{s}/block{j}/{x}"
                      for x in ("pw1/in", "conv2/in", "pw3/in")]
    for n in ("de0", "de1", "de2"):
        order += [f"decoder/{n}/{x}" for x in gt]
    order += ["decoder/de3/conv/in", "decoder/de4/conv/in"]
    return order


def _slot_fold_info() -> list:
    """(act_path, fold_axis) per pack_weights slot -- the boundary whose
    per-LANE activation scales fold into this weight for the v4
    integer-MAC artifact, and the PACKED-layout axis that contracts against
    those lanes (the in-channel axis for mixing convs, the channel axis for
    depthwise).  (None, None) for fp32/bias/alpha slots."""
    none = (None, None)
    info: list = [none, none]  # bm, bs
    info += [("sfe/depth_conv/in", 1)]  # (3, c, 1, 1) depthwise
    for n in ("en0", "en1"):
        info += [(f"encoder/{n}/conv/in", 2), none, none]  # (5, Co, Ci)
    def gt(prefix: str, dw_fold: int) -> list:
        return [
            (prefix + "pw1/in", 1), none, none,        # pw1_w (Co, Ci)
            (prefix + "depth_conv/in", dw_fold), none, none,
            (prefix + "pw2/in", 1), none,              # pw2_w (Co, Ci)
            (prefix + "tra/energy", 1), none,          # tra_dw (3, C, 1)
            (prefix + "tra/gate_in", 1), none,         # tra_pw (Co, Ci)
        ]
    for n in ("en2", "en3", "en4"):
        info += gt(f"encoder/{n}/", 1)  # enc dw (9, C, 1, 1) depthwise
    for s in ("gtcn1", "gtcn2"):
        for j in range(4):
            p = f"{s}/block{j}/"
            info += [
                (p + "pw1/in", 1), none, none,
                (p + "conv2/in", 1), none, none,  # dw (3, C, 1, 1)
                (p + "pw3/in", 1), none, none,
            ]
    for n in ("de0", "de1", "de2"):
        info += gt(f"decoder/{n}/", 3)  # dec dw (3, 3, Co, Ci) full conv
    info += [("decoder/de3/conv/in", 2), none, none]
    info += [("decoder/de4/conv/in", 2), none]
    return info


def _fold_act_scales(t: np.ndarray, scale, axis: int) -> np.ndarray:
    """Multiply the weight's in-lane axis by the boundary's act scales
    (float32 throughout, matching FakeQuantizerV4)."""
    s = np.atleast_1d(np.asarray(scale, np.float32)).ravel()
    if s.size == 1:
        return (t * s[0]).astype(np.float32)
    if t.shape[axis] != s.size:
        raise ValueError(f"fold axis {axis} of {t.shape} != {s.size} lanes")
    shape = [1] * t.ndim
    shape[axis] = s.size
    return (t.astype(np.float32) * s.reshape(shape)).astype(np.float32)


def _quantize_per_channel(t: np.ndarray, axis: int):
    """TFLite-style symmetric per-channel int8, bit-matching
    quant/fake_quant.weight_qparams (all arithmetic in float32 -- float64
    promotion would drift scales by 1 ulp and whole weights by a quantum)."""
    t = t.astype(np.float32)
    red = tuple(i for i in range(t.ndim) if i != axis)
    amax = np.max(np.abs(t), axis=red)
    scale = np.maximum(
        (amax / np.float32(127.0)).astype(np.float32), np.float32(1e-12)
    )
    shape = [1] * t.ndim
    shape[axis] = t.shape[axis]
    q = np.clip(np.rint(t / scale.reshape(shape)), -128, 127).astype(np.int8)
    return q, scale


def export_native_weights_int8(params, act_qp: dict, path: str,
                               integer_pc: bool = False) -> int:
    """Serialize the full-integer quantized artifact (GTM8).

    ``act_qp``: path -> QParams from quant.ptq calibration -- ``act_bits=8``
    yields the full-int8 artifact (the reference's deployment format),
    ``act_bits=16`` the 16x8 mode (int16 activations / int8 weights,
    TFLite's high-dynamic-range variant and the quality-viable quantized
    mode for this model, EVAL.md).  A MIXED act_qp (some boundaries int8,
    some int16, e.g. from quant/mixed.py greedy lifting) emits the v2
    layout: header act_bits=0 and a per-boundary bits field before each
    qparam pair; the native int16 engine executes it (int8-boundary values
    clamp to the int8 grid inside int16 storage -- numerics identical to a
    pure-int8 engine at those boundaries).  Weights are BN-folded THEN
    quantized per out-channel -- the TFLite fold-then-quantize order, which
    is also what the native integer kernels execute.

    Per-channel activation scales select the v3 layout (act_bits=1,
    per-boundary lane vectors; the fp32-MAC PC engine).  ``integer_pc=True``
    emits the v4 layout instead (act_bits=2): every int8 weight slot is
    quantized on its act-scale-FOLDED tensor so the per-channel grid runs
    on FULL-INTEGER MACs (native/gtcrn_micro_v4.cc; sim =
    quant.ptq.QuantizedModel(v4=True)).  Returns the tensor count."""
    from gtcrn_micro_tpu.ops.fused_step import pack_weights

    tensors = [np.asarray(w, np.float32) for w in pack_weights(params)]
    axes = _slot_axes()
    assert len(tensors) == len(axes)
    order = act_path_order()
    missing = [p for p in order if p not in act_qp]
    if missing:
        raise KeyError(f"act_qp missing paths: {missing[:3]}...")

    def bits_of(p: str) -> int:
        qmax = int(act_qp[p].qmax)
        if qmax == 127:
            return 8
        if qmax == 32767:
            return 16
        raise ValueError(f"unsupported act qmax {qmax} at {p}")

    per_bits = [bits_of(p) for p in order]
    uniform = len(set(per_bits)) == 1
    # per-channel act scales (r4b, observe_ranges(per_channel=True)) select
    # the v3 layout: header act_bits=1, then per boundary
    # (bits, n_lanes, scales[n], zeros[n]).  Consumed by the native PC
    # engine (native/gtcrn_micro_pc.cc); v1/v2 readers reject act_bits=1
    # loudly.
    per_channel = any(np.size(np.asarray(qp.scale)) > 1
                      for qp in act_qp.values())
    # header act_bits: 8/16 = uniform (v1 layout, back-compatible);
    # 0 = MIXED precision (v2 layout: per-boundary bits precede each qparam)
    act_bits = 1 if per_channel else (per_bits[0] if uniform else 0)
    # v4 (integer_pc): full-INTEGER MACs under per-lane act scales -- each
    # weight slot is quantized on its act-scale-FOLDED tensor (the folded
    # per-out-channel scale then carries both scales through one float
    # rescale per output; matches quant.ptq.FakeQuantizerV4).  Header
    # act_bits=2; act section uses the v3 per-lane layout.
    fold_info = None
    if integer_pc:
        act_bits = 2
        fold_info = _slot_fold_info()
        assert len(fold_info) == len(axes)

    with open(path, "wb") as f:
        f.write(struct.pack("<II", MAGIC_INT8, len(tensors)))
        for i, (t, axis) in enumerate(zip(tensors, axes)):
            f.write(struct.pack("<I", t.ndim))
            f.write(struct.pack(f"<{t.ndim}I", *t.shape))
            if axis is None:
                f.write(struct.pack("<I", 0))
                f.write(t.astype("<f4").tobytes())
            else:
                if fold_info is not None:
                    act_path, fold_axis = fold_info[i]
                    t = _fold_act_scales(t, act_qp[act_path].scale, fold_axis)
                q, scale = _quantize_per_channel(t, axis)
                f.write(struct.pack("<II", 1, len(scale)))
                f.write(scale.astype("<f4").tobytes())
                f.write(q.tobytes())
        f.write(struct.pack("<II", act_bits, len(order)))
        for p, bits in zip(order, per_bits):
            qp = act_qp[p]
            if per_channel or integer_pc:  # v3/v4: bits, lanes, scales, zeros
                s = np.atleast_1d(np.asarray(qp.scale, np.float32)).ravel()
                z = np.broadcast_to(
                    np.atleast_1d(np.asarray(qp.zero)).ravel(), s.shape
                ).astype(np.int32)
                f.write(struct.pack("<II", bits, len(s)))
                f.write(s.astype("<f4").tobytes())
                f.write(z.astype("<i4").tobytes())
            else:
                if not uniform:
                    f.write(struct.pack("<I", bits))
                f.write(struct.pack("<fi", float(qp.scale), int(qp.zero)))
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
