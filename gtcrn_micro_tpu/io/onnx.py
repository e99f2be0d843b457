"""Minimal ONNX model loader + JAX executor.

The reference scores DNSMOS by running bundled ONNX models through
onnxruntime (eval/eval_nonintrusive_dnsmos.py:87-93).  Neither ``onnx`` nor
``onnxruntime`` exist in this environment, so this module implements the two
pieces needed natively:

1. a dependency-free protobuf wire-format parser for the ONNX subset
   (ModelProto -> GraphProto -> Node/Tensor/Attribute)
2. a JAX interpreter covering the op set of the shipped DNSMOS models
   (sig_bak_ovr.onnx, model_v8.onnx: Conv, MatMul, MaxPool, Relu, elementwise
   arithmetic, shape ops) -- so DNSMOS scoring runs jit-compiled on TPU
   instead of through a host-side C++ runtime.

This is an interpreter for small inference graphs, not a general ONNX
importer; unsupported ops raise immediately with the op name.
"""

from __future__ import annotations

import dataclasses
import struct

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# protobuf wire format
# ---------------------------------------------------------------------------


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    r = s = 0
    while True:
        x = b[i]
        i += 1
        r |= (x & 0x7F) << s
        if not x & 0x80:
            return r, i
        s += 7


def _fields(b: bytes):
    """Yield (field_number, wire_type, value) triplets."""
    i = 0
    while i < len(b):
        tag, i = _read_varint(b, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _read_varint(b, i)
        elif wt == 1:
            v = b[i : i + 8]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(b, i)
            v = b[i : i + ln]
            i += ln
        elif wt == 5:
            v = b[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def _packed_varints(b: bytes) -> list[int]:
    out, i = [], 0
    while i < len(b):
        v, i = _read_varint(b, i)
        out.append(v)
    return out


def _signed(v: int) -> int:
    """Interpret a varint as two's-complement int64."""
    return v - (1 << 64) if v >= 1 << 63 else v


# ---------------------------------------------------------------------------
# ONNX schema subset
# ---------------------------------------------------------------------------

_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
}


def _parse_tensor(b: bytes) -> tuple[str, np.ndarray]:
    dims, dtype, raw, name = [], 1, None, ""
    float_data, int64_data, int32_data = [], [], []
    for fn, wt, v in _fields(b):
        if fn == 1:
            if wt == 0:
                dims.append(_signed(v))
            else:
                dims.extend(_signed(x) for x in _packed_varints(v))
        elif fn == 2:
            dtype = v
        elif fn == 4:
            if wt == 5:
                float_data.append(struct.unpack("<f", v)[0])
            else:
                float_data.extend(
                    struct.unpack(f"<{len(v) // 4}f", v)
                )
        elif fn == 5:
            if wt == 0:
                int32_data.append(_signed(v))
            else:
                int32_data.extend(_signed(x) for x in _packed_varints(v))
        elif fn == 7:
            if wt == 0:
                int64_data.append(_signed(v))
            else:
                int64_data.extend(_signed(x) for x in _packed_varints(v))
        elif fn == 8:
            name = v.decode()
        elif fn == 9:
            raw = v
    np_dtype = _DTYPES[dtype]
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np_dtype)
    elif float_data:
        arr = np.array(float_data, dtype=np_dtype)
    elif int64_data:
        arr = np.array(int64_data, dtype=np_dtype)
    elif int32_data:
        arr = np.array(int32_data, dtype=np_dtype)
    else:
        arr = np.zeros(0, dtype=np_dtype)
    return name, arr.reshape(dims)


def _parse_attribute(b: bytes) -> tuple[str, object]:
    name, atype = "", 0
    f = i = s = t = None
    floats, ints = [], []
    for fn, wt, v in _fields(b):
        if fn == 1:
            name = v.decode()
        elif fn == 2:
            f = struct.unpack("<f", v)[0]
        elif fn == 3:
            i = _signed(v)
        elif fn == 4:
            s = v
        elif fn == 5:
            t = _parse_tensor(v)[1]
        elif fn == 7:
            if wt == 5:
                floats.append(struct.unpack("<f", v)[0])
            else:
                floats.extend(struct.unpack(f"<{len(v) // 4}f", v))
        elif fn == 8:
            if wt == 0:
                ints.append(_signed(v))
            else:
                ints.extend(_signed(x) for x in _packed_varints(v))
        elif fn == 20:
            atype = v
    value = {1: f, 2: i, 3: s, 4: t, 6: floats, 7: ints}.get(atype)
    if value is None:  # attribute type unset: fall back on whichever is set
        value = next(
            (x for x in (f, i, s, t) if x is not None), ints or floats
        )
    return name, value


@dataclasses.dataclass
class OnnxNode:
    op_type: str
    inputs: list[str]
    outputs: list[str]
    attrs: dict


@dataclasses.dataclass
class OnnxGraph:
    nodes: list[OnnxNode]
    initializers: dict[str, np.ndarray]
    inputs: list[str]
    outputs: list[str]


def _parse_value_info_name(b: bytes) -> str:
    for fn, _wt, v in _fields(b):
        if fn == 1:
            return v.decode()
    return ""


def _parse_node(b: bytes) -> OnnxNode:
    inputs, outputs, attrs, op_type = [], [], {}, ""
    for fn, _wt, v in _fields(b):
        if fn == 1:
            inputs.append(v.decode())
        elif fn == 2:
            outputs.append(v.decode())
        elif fn == 4:
            op_type = v.decode()
        elif fn == 5:
            k, val = _parse_attribute(v)
            attrs[k] = val
    return OnnxNode(op_type, inputs, outputs, attrs)


def _parse_graph(b: bytes) -> OnnxGraph:
    nodes, inits, inputs, outputs = [], {}, [], []
    for fn, _wt, v in _fields(b):
        if fn == 1:
            nodes.append(_parse_node(v))
        elif fn == 5:
            name, arr = _parse_tensor(v)
            inits[name] = arr
        elif fn == 11:
            inputs.append(_parse_value_info_name(v))
        elif fn == 12:
            outputs.append(_parse_value_info_name(v))
    inputs = [n for n in inputs if n not in inits]
    return OnnxGraph(nodes, inits, inputs, outputs)


def load_onnx(path: str | bytes) -> OnnxGraph:
    """Parse an .onnx file (path or raw bytes) into an OnnxGraph (no onnx
    package needed)."""
    data = path if isinstance(path, (bytes, bytearray)) else open(path, "rb").read()
    for fn, _wt, v in _fields(data):
        if fn == 7:  # ModelProto.graph
            return _parse_graph(v)
    raise ValueError(f"{path}: no graph found")


# ---------------------------------------------------------------------------
# JAX interpreter
# ---------------------------------------------------------------------------

_HIGHEST = jax.lax.Precision.HIGHEST


def _op_conv(node, x, w, b=None):
    a = node.attrs
    group = a.get("group", 1)
    strides = tuple(a.get("strides", [1] * (w.ndim - 2)))
    dilations = tuple(a.get("dilations", [1] * (w.ndim - 2)))
    pads = a.get("pads")
    auto = a.get("auto_pad", b"NOTSET")
    if pads:
        half = len(pads) // 2
        padding = tuple(zip(pads[:half], pads[half:]))
    elif auto in (b"SAME_UPPER", b"SAME_LOWER"):
        # explicit per-dim pads: ONNX puts the odd pad element at the END
        # for SAME_UPPER and at the BEGINNING for SAME_LOWER (XLA's "SAME"
        # only covers the former)
        padding = []
        for i in range(w.ndim - 2):
            in_sz = x.shape[2 + i]
            k_eff = (w.shape[2 + i] - 1) * dilations[i] + 1
            out_sz = -(-in_sz // strides[i])
            total = max((out_sz - 1) * strides[i] + k_eff - in_sz, 0)
            small, big = total // 2, total - total // 2
            padding.append(
                (small, big) if auto == b"SAME_UPPER" else (big, small)
            )
        padding = tuple(padding)
    else:
        padding = tuple((0, 0) for _ in range(w.ndim - 2))
    out = jax.lax.conv_general_dilated(
        x, w, strides, padding, rhs_dilation=dilations,
        feature_group_count=group, precision=_HIGHEST,
    )
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * (out.ndim - 2))
    return out


def _op_maxpool(node, x):
    a = node.attrs
    k = tuple(a["kernel_shape"])
    strides = tuple(a.get("strides", k))
    pads = a.get("pads", [0] * (2 * len(k)))
    half = len(pads) // 2
    padding = ((0, 0), (0, 0)) + tuple(zip(pads[:half], pads[half:]))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, 1) + k, (1, 1) + strides, padding,
    )


def _op_slice(node, data, *rest):
    if rest:  # opset >= 10: starts/ends/axes/steps as inputs
        starts, ends = np.asarray(rest[0]), np.asarray(rest[1])
        axes = (
            np.asarray(rest[2])
            if len(rest) > 2
            else np.arange(len(starts))
        )
        steps = np.asarray(rest[3]) if len(rest) > 3 else np.ones_like(starts)
    else:  # opset 1: attributes
        starts = np.asarray(node.attrs["starts"])
        ends = np.asarray(node.attrs["ends"])
        axes = np.asarray(node.attrs.get("axes", np.arange(len(starts))))
        steps = np.ones_like(starts)
    idx = [slice(None)] * data.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        dim = data.shape[ax]
        en = min(int(en), dim) if en >= 0 else int(en)
        idx[int(ax)] = slice(int(st), en, int(sp))
    return data[tuple(idx)]


def _op_reduce_max(node, x, axes=None):
    if axes is None:
        axes = node.attrs.get("axes")
    axes = tuple(int(a) for a in np.atleast_1d(np.asarray(axes))) \
        if axes is not None else None
    keepdims = bool(node.attrs.get("keepdims", 1))
    return jnp.max(x, axis=axes, keepdims=keepdims)


def _op_unsqueeze(node, x, axes=None):
    if axes is None:
        axes = node.attrs["axes"]
    for ax in sorted(int(a) for a in np.atleast_1d(np.asarray(axes))):
        x = jnp.expand_dims(x, ax)
    return x


def _op_reduce_sum(node, x, axes=None):
    if axes is None:
        axes = node.attrs.get("axes")
    axes = tuple(int(a) for a in np.atleast_1d(np.asarray(axes))) \
        if axes is not None else None
    keepdims = bool(node.attrs.get("keepdims", 1))
    return jnp.sum(x, axis=axes, keepdims=keepdims)


def _op_pad(node, x, pads, value=None, axes=None):
    mode = node.attrs.get("mode", b"constant")
    if mode != b"constant":
        raise NotImplementedError(f"Pad mode {mode!r}")
    pads = np.asarray(pads)
    half = len(pads) // 2
    if axes is not None:
        full = np.zeros(2 * x.ndim, np.int64)
        for i, ax in enumerate(np.asarray(axes)):
            full[int(ax)] = pads[i]
            full[x.ndim + int(ax)] = pads[half + i]
        pads, half = full, x.ndim
    cfg = [(int(pads[i]), int(pads[half + i]), 0) for i in range(half)]
    cval = jnp.asarray(0.0 if value is None else jnp.ravel(value)[0], x.dtype)
    return jax.lax.pad(x, cval, cfg)


def _op_avgpool(n, x):
    k = tuple(n.attrs["kernel_shape"])
    strides = tuple(n.attrs.get("strides", k))
    pads = n.attrs.get("pads", [0] * (2 * len(k)))
    if any(pads) and not n.attrs.get("count_include_pad", 0):
        raise NotImplementedError(
            "AveragePool with pads and count_include_pad=0"
        )
    half = len(pads) // 2
    padding = ((0, 0), (0, 0)) + tuple(zip(pads[:half], pads[half:]))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1) + k, (1, 1) + strides, padding
    )
    return summed / float(np.prod(k))


_OPS = {
    "Add": lambda n, a, b: a + b,
    "Sub": lambda n, a, b: a - b,
    "Mul": lambda n, a, b: a * b,
    "Div": lambda n, a, b: a / b,
    "Pow": lambda n, a, b: a ** b,
    "Sqrt": lambda n, a: jnp.sqrt(a),
    "Log": lambda n, a: jnp.log(a),
    "Exp": lambda n, a: jnp.exp(a),
    "Abs": lambda n, a: jnp.abs(a),
    "Neg": lambda n, a: -a,
    "Max": lambda n, *xs: jnp.maximum(*xs) if len(xs) == 2
        else jnp.max(jnp.stack(xs), axis=0),
    "Min": lambda n, *xs: jnp.minimum(*xs) if len(xs) == 2
        else jnp.min(jnp.stack(xs), axis=0),
    "Relu": lambda n, a: jax.nn.relu(a),
    "Sigmoid": lambda n, a: jax.nn.sigmoid(a),
    "Tanh": lambda n, a: jnp.tanh(a),
    "MatMul": lambda n, a, b: jnp.matmul(a, b, precision=_HIGHEST),
    "Gemm": lambda n, a, b, c=None: (
        jnp.matmul(
            a.T if n.attrs.get("transA") else a,
            b.T if n.attrs.get("transB") else b,
            precision=_HIGHEST,
        ) * n.attrs.get("alpha", 1.0)
        + (n.attrs.get("beta", 1.0) * c if c is not None else 0.0)
    ),
    "Conv": _op_conv,
    "MaxPool": _op_maxpool,
    "AveragePool": _op_avgpool,
    "GlobalAveragePool": lambda n, x: jnp.mean(
        x, axis=tuple(range(2, x.ndim)), keepdims=True
    ),
    "Transpose": lambda n, x: jnp.transpose(x, n.attrs.get("perm")),
    "Reshape": lambda n, x, shape: jnp.reshape(
        x, [int(s) for s in np.asarray(shape)]
    ),
    "Concat": lambda n, *xs: jnp.concatenate(xs, axis=n.attrs["axis"]),
    "Squeeze": lambda n, x, axes=None: jnp.squeeze(
        x,
        None
        if (axes is None and n.attrs.get("axes") is None)
        else tuple(int(a) for a in np.atleast_1d(np.asarray(
            axes if axes is not None else n.attrs["axes"]))),
    ),
    "Unsqueeze": _op_unsqueeze,
    "Slice": _op_slice,
    "ReduceMax": _op_reduce_max,
    "ReduceMean": lambda n, x: jnp.mean(
        x,
        axis=tuple(int(a) for a in n.attrs.get("axes", [])) or None,
        keepdims=bool(n.attrs.get("keepdims", 1)),
    ),
    "Flatten": lambda n, x: jnp.reshape(
        x, (int(np.prod(x.shape[: n.attrs.get("axis", 1)])), -1)
    ),
    "ReduceSum": _op_reduce_sum,
    "Expand": lambda n, x, shape: jnp.broadcast_to(
        x, np.broadcast_shapes(
            x.shape, tuple(int(s) for s in np.asarray(shape))
        )
    ),
    "Reciprocal": lambda n, x: 1.0 / x,
    "Where": lambda n, c, a, b: jnp.where(c, a, b),
    "Greater": lambda n, a, b: a > b,
    "Less": lambda n, a, b: a < b,
    "Equal": lambda n, a, b: a == b,
    "GreaterOrEqual": lambda n, a, b: a >= b,
    "LessOrEqual": lambda n, a, b: a <= b,
    "And": lambda n, a, b: a & b,
    "Or": lambda n, a, b: a | b,
    "Not": lambda n, a: ~a,
    "Pad": _op_pad,
    "Sign": lambda n, x: jnp.sign(x),
    "Floor": lambda n, x: jnp.floor(x),
    "Ceil": lambda n, x: jnp.ceil(x),
    "PRelu": lambda n, x, slope: jnp.where(x > 0, x, slope * x),
    "Identity": lambda n, x: x,
    "Cast": lambda n, x: x.astype(_DTYPES[n.attrs["to"]]),
    "Shape": lambda n, x: np.asarray(x.shape, np.int64),
    "Clip": lambda n, x, lo=None, hi=None: jnp.clip(x, lo, hi),
}


class OnnxModel:
    """Executable ONNX graph: ``OnnxModel(path)(input_array)``.

    Weights live as a params dict; ``__call__`` is jit-compiled per input
    shape.  This is the TPU-native replacement for an onnxruntime session.
    """

    def __init__(self, path: str | bytes):
        self.graph = load_onnx(path)
        self.params = {
            k: jnp.asarray(v) if v.dtype != np.int64 else v
            for k, v in self.graph.initializers.items()
        }
        self.input_names = self.graph.inputs
        self.output_names = self.graph.outputs
        self._jit = jax.jit(self._run_traced)

    def _run(self, env: dict) -> list:
        for node in self.graph.nodes:
            fn = _OPS.get(node.op_type)
            if fn is None:
                raise NotImplementedError(
                    f"ONNX op {node.op_type!r} not supported"
                )
            args = [env[name] if name else None for name in node.inputs]
            out = fn(node, *args)
            outs = out if isinstance(out, (tuple, list)) else [out]
            for name, val in zip(node.outputs, outs):
                env[name] = val
        return [env[name] for name in self.output_names]

    def _run_traced(self, inputs: dict):
        env = dict(self.params)
        env.update(inputs)
        return self._run(env)

    def __call__(self, *arrays) -> list:
        inputs = {
            name: jnp.asarray(a)
            for name, a in zip(self.input_names, arrays)
        }
        return [np.asarray(o) for o in self._jit(inputs)]
