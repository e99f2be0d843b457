"""ONNX emission: trace any jittable JAX function to an ONNX (opset 16) file.

The reference exports its graph with ``torch.onnx.export`` (opset 16, static
shapes, input "audio"; streaming/conversion/stream_onnx.py:15-129).  The
TPU-native equivalent here is a *jaxpr-to-ONNX lowering*: ``jax.make_jaxpr``
traces the function once (XLA semantics: static shapes, no Python control
flow), each lax primitive is mapped to ONNX ops, and the graph is serialized
with a dependency-free protobuf encoder -- the exact mirror of the wire-format
parser in :mod:`gtcrn_micro_tpu.io.onnx` (neither ``onnx`` nor ``torch`` is
needed).

Properties:

- closure constants (the params pytree) become ONNX initializers; eqns whose
  inputs are all constant are folded at export time (BatchNorm's
  ``rsqrt(var+eps)*gamma`` chains collapse into plain Mul/Add initializers)
- ``conv_general_dilated`` lowers to Conv with NCHW transposes; weight-layout
  transposes fold into the initializer.  ``lhs_dilation`` (the decoder's
  transposed convs, nn/core.py:341-369) lowers to explicit zero-stuffing
  (Unsqueeze/Concat/Reshape/Slice) -- the same decomposition the reference's
  StreamConvTranspose2d performs by hand (conversion/convolution.py:218-250)
- ``dot_general`` lowers to MatMul (with Transpose/Reshape canonicalisation
  only when the contraction is not already MatMul-shaped)
- round-trip guarantee: every emitted model reloads through
  :class:`gtcrn_micro_tpu.io.onnx.OnnxModel` and matches the traced function
  (tests/io/test_onnx_export.py)
"""

from __future__ import annotations

import struct

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# protobuf wire-format encoder (mirror of io/onnx.py's decoder)
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _f_varint(fn: int, v: int) -> bytes:
    if v < 0:  # two's-complement int64
        v += 1 << 64
    return _varint(fn << 3) + _varint(v)


def _f_bytes(fn: int, b: bytes) -> bytes:
    return _varint((fn << 3) | 2) + _varint(len(b)) + b


def _f_float(fn: int, v: float) -> bytes:
    return _varint((fn << 3) | 5) + struct.pack("<f", v)


_ONNX_DTYPE = {
    np.dtype(np.float32): 1, np.dtype(np.uint8): 2, np.dtype(np.int8): 3,
    np.dtype(np.uint16): 4, np.dtype(np.int16): 5, np.dtype(np.int32): 6,
    np.dtype(np.int64): 7, np.dtype(np.bool_): 9, np.dtype(np.float16): 10,
    np.dtype(np.float64): 11,
}


def _tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    out = b"".join(_f_varint(1, int(d)) for d in arr.shape)
    out += _f_varint(2, _ONNX_DTYPE[arr.dtype])
    out += _f_bytes(8, name.encode())
    out += _f_bytes(9, arr.tobytes())
    return out


def _attr(name: str, value) -> bytes:
    out = _f_bytes(1, name.encode())
    if isinstance(value, (bytes, str)):
        v = value.encode() if isinstance(value, str) else value
        out += _f_bytes(4, v) + _f_varint(20, 3)  # STRING
    elif isinstance(value, bool) or isinstance(value, (int, np.integer)):
        out += _f_varint(3, int(value)) + _f_varint(20, 2)  # INT
    elif isinstance(value, float):
        out += _f_float(2, value) + _f_varint(20, 1)  # FLOAT
    elif isinstance(value, np.ndarray):
        out += _f_bytes(5, _tensor_proto("", value)) + _f_varint(20, 4)
    elif isinstance(value, (list, tuple)):
        if value and isinstance(value[0], float):
            out += b"".join(_f_float(7, float(v)) for v in value)
            out += _f_varint(20, 6)  # FLOATS
        else:
            out += b"".join(_f_varint(8, int(v)) for v in value)
            out += _f_varint(20, 7)  # INTS
    else:
        raise TypeError(f"attribute {name}: unsupported type {type(value)}")
    return out


def _node_proto(op_type: str, inputs, outputs, attrs: dict) -> bytes:
    out = b"".join(_f_bytes(1, n.encode()) for n in inputs)
    out += b"".join(_f_bytes(2, n.encode()) for n in outputs)
    out += _f_bytes(4, op_type.encode())
    out += b"".join(_f_bytes(5, _attr(k, v)) for k, v in attrs.items())
    return out


def _value_info(name: str, shape, dtype) -> bytes:
    dims = b"".join(
        _f_bytes(1, _f_varint(1, int(d))) for d in shape
    )
    tensor_type = _f_varint(1, _ONNX_DTYPE[np.dtype(dtype)])
    tensor_type += _f_bytes(2, dims)
    return _f_bytes(1, name.encode()) + _f_bytes(2, _f_bytes(1, tensor_type))


def _model_proto(graph: bytes, opset: int = 16) -> bytes:
    out = _f_varint(1, 8)  # ir_version 8
    out += _f_bytes(2, b"gtcrn_micro_tpu")
    out += _f_bytes(7, graph)
    out += _f_bytes(8, _f_bytes(1, b"") + _f_varint(2, opset))
    return out


# ---------------------------------------------------------------------------
# jaxpr -> ONNX lowering
# ---------------------------------------------------------------------------

# Values flowing through the emitter: np.ndarray = compile-time constant,
# str = symbolic ONNX tensor name.


class _Emitter:
    def __init__(self):
        self.nodes: list[bytes] = []
        self.initializers: dict[str, np.ndarray] = {}
        self._init_by_id: dict[int, str] = {}
        self._n = 0
        self.env: dict = {}

    # -- naming / value plumbing --------------------------------------------

    def fresh(self, hint: str = "t") -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def sym(self, val) -> str:
        """Symbol name for a value; constants become initializers."""
        if isinstance(val, str):
            return val
        key = id(val)
        name = self._init_by_id.get(key)
        if name is None:
            name = self.fresh("const")
            self.initializers[name] = val
            self._init_by_id[key] = name
        return name

    def const_i64(self, values) -> str:
        return self.sym(np.asarray(values, np.int64))

    def node(self, op: str, args, n_out: int = 1, **attrs):
        outs = [self.fresh(op.lower()) for _ in range(n_out)]
        self.nodes.append(
            _node_proto(op, [self.sym(a) for a in args], outs, attrs)
        )
        return outs[0] if n_out == 1 else outs

    def read(self, var):
        if hasattr(var, "val"):  # Literal
            return np.asarray(var.val)
        return self.env[var]

    # -- const-folding helpers ------------------------------------------------

    def t(self, val, perm):
        """Transpose, folding constants and identity perms."""
        if list(perm) == list(range(len(perm))):
            return val
        if isinstance(val, np.ndarray):
            return np.ascontiguousarray(np.transpose(val, perm))
        return self.node("Transpose", [val], perm=list(perm))

    def r(self, val, shape, cur_shape):
        """Reshape, folding constants and no-ops."""
        if tuple(shape) == tuple(cur_shape):
            return val
        if isinstance(val, np.ndarray):
            return np.ascontiguousarray(val.reshape(shape))
        return self.node("Reshape", [val, self.const_i64(shape)])

    # -- the walk -------------------------------------------------------------

    def process(self, jaxpr):
        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            sub = _call_jaxpr(eqn)
            if sub is not None:
                invals = [self.read(v) for v in eqn.invars]
                for var, c in zip(sub.jaxpr.constvars, sub.consts):
                    self.env[var] = np.asarray(c)
                for var, v in zip(sub.jaxpr.invars, invals):
                    self.env[var] = v
                self.process(sub.jaxpr)
                for out, inner in zip(eqn.outvars, sub.jaxpr.outvars):
                    self.env[out] = self.read(inner)
                continue
            invals = [self.read(v) for v in eqn.invars]
            if all(isinstance(v, np.ndarray) for v in invals):
                outs = eqn.primitive.bind(
                    *(jnp.asarray(v) for v in invals), **eqn.params
                )
                if not eqn.primitive.multiple_results:
                    outs = [outs]
                for var, v in zip(eqn.outvars, outs):
                    self.env[var] = np.asarray(v)
                continue
            handler = _HANDLERS.get(name)
            if handler is None:
                raise NotImplementedError(
                    f"ONNX export: unsupported primitive {name!r}"
                )
            self.env[eqn.outvars[0]] = handler(self, eqn, invals)


def _call_jaxpr(eqn):
    """Closed jaxpr of call-like primitives (pjit/custom_jvp/...), else None."""
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        sub = eqn.params.get(key)
        if sub is not None and hasattr(sub, "jaxpr"):
            return sub
    return None


def _shape(eqn, i):
    v = eqn.invars[i]
    return tuple(v.val.shape) if hasattr(v, "val") else tuple(v.aval.shape)


def _out_shape(eqn):
    return tuple(eqn.outvars[0].aval.shape)


def _ew(op):
    return lambda self, eqn, args: self.node(op, args)


def _rsqrt(self, eqn, args):
    return self.node("Reciprocal", [self.node("Sqrt", args)])


def _integer_pow(self, eqn, args):
    y = eqn.params["y"]
    if y == 2:
        return self.node("Mul", [args[0], args[0]])
    dtype = eqn.outvars[0].aval.dtype
    return self.node("Pow", [args[0], np.asarray(y, dtype)])


def _transpose(self, eqn, args):
    return self.t(args[0], eqn.params["permutation"])


def _reshape(self, eqn, args):
    if eqn.params.get("dimensions") is not None:
        args = [self.t(args[0], eqn.params["dimensions"])]
    return self.r(args[0], _out_shape(eqn), _shape(eqn, 0))


def _squeeze(self, eqn, args):
    axes = [int(a) for a in eqn.params["dimensions"]]
    return self.node("Squeeze", [args[0], self.const_i64(axes)])


def _concatenate(self, eqn, args):
    return self.node("Concat", args, axis=int(eqn.params["dimension"]))


def _slice(self, eqn, args):
    p = eqn.params
    starts = [int(s) for s in p["start_indices"]]
    ends = [int(e) for e in p["limit_indices"]]
    steps = [int(s) for s in (p["strides"] or [1] * len(starts))]
    axes = list(range(len(starts)))
    return self.node(
        "Slice",
        [args[0], self.const_i64(starts), self.const_i64(ends),
         self.const_i64(axes), self.const_i64(steps)],
    )


def _broadcast_in_dim(self, eqn, args):
    out_shape = _out_shape(eqn)
    in_shape = _shape(eqn, 0)
    bd = eqn.params["broadcast_dimensions"]
    mid = [1] * len(out_shape)
    for i, d in enumerate(bd):
        mid[d] = in_shape[i]
    x = self.r(args[0], mid, in_shape)
    if tuple(mid) == tuple(out_shape):
        return x
    return self.node("Expand", [x, self.const_i64(out_shape)])


def _reduce(op):
    def handler(self, eqn, args):
        axes = [int(a) for a in eqn.params["axes"]]
        return self.node(op, [args[0], self.const_i64(axes)], keepdims=0)

    return handler


def _convert_element_type(self, eqn, args):
    to = _ONNX_DTYPE[np.dtype(eqn.params["new_dtype"])]
    return self.node("Cast", args, to=to)


def _select_n(self, eqn, args):
    if len(args) != 3:
        raise NotImplementedError("select_n with >2 cases")
    # select_n(pred, on_false, on_true); ONNX Where(cond, X, Y) is X if cond
    return self.node("Where", [args[0], args[2], args[1]])


def _pad(self, eqn, args):
    cfg = eqn.params["padding_config"]
    if any(inner != 0 for _, _, inner in cfg):
        raise NotImplementedError("lax.pad with interior padding")
    if any(lo < 0 or hi < 0 for lo, hi, _ in cfg):
        raise NotImplementedError("lax.pad with negative padding")
    pads = [lo for lo, _, _ in cfg] + [hi for _, hi, _ in cfg]
    return self.node("Pad", [args[0], self.const_i64(pads), args[1]])


def _dot_general(self, eqn, args):
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = args
    ls, rs = _shape(eqn, 0), _shape(eqn, 1)
    lc, rc, lb, rb = list(lc), list(rc), list(lb), list(rb)
    # fast path: jnp.dot(x, W) -- contraction on lhs's last dim vs rhs dim 0
    if not lb and lc == [len(ls) - 1] and rc == [0] and len(rs) == 2:
        return self.node("MatMul", [lhs, rhs])
    l_free = [i for i in range(len(ls)) if i not in lc and i not in lb]
    r_free = [i for i in range(len(rs)) if i not in rc and i not in rb]
    bdims = [ls[i] for i in lb]
    m = int(np.prod([ls[i] for i in l_free], initial=1))
    k = int(np.prod([ls[i] for i in lc], initial=1))
    n = int(np.prod([rs[i] for i in r_free], initial=1))
    lt = self.t(lhs, lb + l_free + lc)
    rt = self.t(rhs, rb + rc + r_free)
    lt = self.r(lt, bdims + [m, k], [ls[i] for i in lb + l_free + lc])
    rt = self.r(rt, bdims + [k, n], [rs[i] for i in rb + rc + r_free])
    out = self.node("MatMul", [lt, rt])
    return self.r(out, _out_shape(eqn), bdims + [m, n])


def _zero_stuff(self, x, shape, axis, factor):
    """Interleave ``factor - 1`` zeros after each element along ``axis``
    (lhs_dilation; the reference's StreamConvTranspose2d zero-stuffing,
    conversion/convolution.py:218-226).  Returns (symbol, new_shape)."""
    d = shape[axis]
    unsq = self.node("Unsqueeze", [x, self.const_i64([axis + 1])])
    zshape = list(shape[: axis + 1]) + [factor - 1] + list(shape[axis + 1:])
    zeros = np.zeros(zshape, np.float32)
    cat = self.node("Concat", [unsq, zeros], axis=axis + 1)
    merged = list(shape)
    merged[axis] = d * factor
    out = self.node("Reshape", [cat, self.const_i64(merged)])
    new_d = (d - 1) * factor + 1
    starts = [0] * len(shape)
    ends = list(merged)
    ends[axis] = new_d
    out = self.node(
        "Slice",
        [out, self.const_i64(starts), self.const_i64(ends),
         self.const_i64(list(range(len(shape)))),
         self.const_i64([1] * len(shape))],
    )
    merged[axis] = new_d
    return out, merged


def _conv(self, eqn, args):
    p = eqn.params
    if p.get("batch_group_count", 1) != 1:
        raise NotImplementedError("conv batch_group_count > 1")
    lhs_spec, rhs_spec, out_spec = p["dimension_numbers"]
    n_sp = len(lhs_spec) - 2
    x = self.t(args[0], list(lhs_spec))  # -> (N, C, *spatial)
    w = self.t(args[1], list(rhs_spec))  # -> (O, I, *spatial)
    shape = [(_shape(eqn, 0))[i] for i in lhs_spec]

    lhs_dil = list(p.get("lhs_dilation") or [1] * n_sp)
    for i, f in enumerate(lhs_dil):
        if f > 1:
            x, shape = _zero_stuff(self, x, shape, 2 + i, f)

    padding = [list(pp) for pp in p["padding"]]
    if any(lo < 0 or hi < 0 for lo, hi in padding):
        starts = [0, 0] + [max(-lo, 0) for lo, _ in padding]
        ends = list(shape[:2]) + [
            shape[2 + i] - max(-hi, 0) for i, (_, hi) in enumerate(padding)
        ]
        x = self.node(
            "Slice",
            [x, self.const_i64(starts), self.const_i64(ends),
             self.const_i64(list(range(len(shape)))),
             self.const_i64([1] * len(shape))],
        )
        padding = [[max(lo, 0), max(hi, 0)] for lo, hi in padding]

    out = self.node(
        "Conv", [x, w],
        strides=[int(s) for s in p["window_strides"]],
        dilations=[int(d) for d in (p.get("rhs_dilation") or [1] * n_sp)],
        pads=[lo for lo, _ in padding] + [hi for _, hi in padding],
        group=int(p.get("feature_group_count", 1)),
    )
    # conv output is (N, O, *spatial); place dim k at position out_spec[k]
    inv = [0] * len(out_spec)
    for k, d in enumerate(out_spec):
        inv[d] = k
    return self.t(out, inv)


_HANDLERS = {
    "add": _ew("Add"), "sub": _ew("Sub"), "mul": _ew("Mul"),
    "div": _ew("Div"), "max": _ew("Max"), "min": _ew("Min"),
    "pow": _ew("Pow"), "tanh": _ew("Tanh"), "logistic": _ew("Sigmoid"),
    "sqrt": _ew("Sqrt"), "exp": _ew("Exp"), "log": _ew("Log"),
    "abs": _ew("Abs"), "neg": _ew("Neg"), "sign": _ew("Sign"),
    "floor": _ew("Floor"), "ceil": _ew("Ceil"),
    "gt": _ew("Greater"), "lt": _ew("Less"), "eq": _ew("Equal"),
    "ge": _ew("GreaterOrEqual"), "le": _ew("LessOrEqual"),
    "and": _ew("And"), "or": _ew("Or"), "not": _ew("Not"),
    "rsqrt": _rsqrt, "integer_pow": _integer_pow,
    "transpose": _transpose, "reshape": _reshape, "squeeze": _squeeze,
    "concatenate": _concatenate, "slice": _slice,
    "broadcast_in_dim": _broadcast_in_dim,
    "reduce_sum": _reduce("ReduceSum"), "reduce_max": _reduce("ReduceMax"),
    "reduce_min": _reduce("ReduceMin"),
    "convert_element_type": _convert_element_type,
    "select_n": _select_n, "pad": _pad,
    "dot_general": _dot_general, "conv_general_dilated": _conv,
    "stop_gradient": lambda self, eqn, args: args[0]
    if isinstance(args[0], str) else self.node("Identity", args),
    "copy": lambda self, eqn, args: self.node("Identity", args),
}


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def export_onnx(
    fn,
    example_args,
    *,
    input_names: list[str] | None = None,
    output_names: list[str] | None = None,
    graph_name: str = "jax_graph",
) -> bytes:
    """Trace ``fn(*example_args)`` and emit an ONNX (opset 16) model.

    Arrays closed over by ``fn`` (e.g. the params pytree) become initializers;
    ``example_args`` leaves become graph inputs.  ``input_names`` /
    ``output_names`` follow ``jax.tree.leaves`` order of the args / outputs
    (auto-named ``input_i`` / ``output_i`` when omitted).
    """
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr
    flat_args = jax.tree.leaves(example_args)
    if input_names is None:
        input_names = [f"input_{i}" for i in range(len(flat_args))]
    if len(input_names) != len(jaxpr.invars):
        raise ValueError(
            f"{len(input_names)} input names for {len(jaxpr.invars)} inputs"
        )

    em = _Emitter()
    for var, c in zip(jaxpr.constvars, closed.consts):
        em.env[var] = np.asarray(c)
    graph_inputs = []
    for var, name, arg in zip(jaxpr.invars, input_names, flat_args):
        em.env[var] = name
        graph_inputs.append(_value_info(name, arg.shape, arg.dtype))
    em.process(jaxpr)

    if output_names is None:
        output_names = [f"output_{i}" for i in range(len(jaxpr.outvars))]
    graph_outputs = []
    for var, name in zip(jaxpr.outvars, output_names):
        val = em.read(var)
        sym = em.sym(val)
        if sym != name:  # bind graph-output name (Identity also covers
            # constant outputs and outputs aliasing a graph input)
            em.nodes.append(_node_proto("Identity", [sym], [name], {}))
        graph_outputs.append(
            _value_info(name, var.aval.shape, var.aval.dtype)
        )

    graph = b"".join(_f_bytes(1, n) for n in em.nodes)
    graph += _f_bytes(2, graph_name.encode())
    graph += b"".join(
        _f_bytes(5, _tensor_proto(k, v)) for k, v in em.initializers.items()
    )
    graph += b"".join(_f_bytes(11, vi) for vi in graph_inputs)
    graph += b"".join(_f_bytes(12, vi) for vi in graph_outputs)
    return _model_proto(graph)


def export_model_onnx(model, params, batch: int = 1, frames: int = 63) -> bytes:
    """Offline GTCRN-Micro graph as ONNX: enhanced = f(audio (B,257,T,2)).

    Matches the reference's export semantics (static shapes, offline graph,
    input "audio"; stream_onnx.py:93-105 -- despite its name it too exports
    the offline model, stream_onnx.py:12)."""
    spec = jnp.zeros((batch, model.config.n_freqs, frames, 2), jnp.float32)
    return export_onnx(
        lambda s: model.apply(params, s),
        (spec,),
        input_names=["audio"],
        output_names=["enhanced"],
        graph_name="gtcrn_micro",
    )


def export_stream_onnx(model, params, batch: int = 1) -> bytes:
    """One streaming step as ONNX -- the artifact the reference *names* but
    never produces (stream_onnx.py:12 exports the offline graph instead).

    Inputs: "audio" (B,257,1,2) + one input per shift cache (state path);
    outputs: "enhanced" + updated caches as ``<path>.out``.  Shift-mode state
    keeps the graph static-shape (concat + slice); ring state would need
    ScatterND and a step counter for no benefit at batch 1.
    """
    state = model.init_state(batch, ring=False)
    keys = sorted(state)
    spec = jnp.zeros((batch, model.config.n_freqs, 1, 2), jnp.float32)

    def step(state_list, s):
        st = dict(zip(keys, state_list))
        out, new_state = model.step(params, st, s)
        return out, [new_state[k] for k in keys]

    return export_onnx(
        step,
        ([state[k] for k in keys], spec),
        input_names=keys + ["audio"],
        output_names=["enhanced"] + [f"{k}.out" for k in keys],
        graph_name="gtcrn_micro_stream",
    )


def export_audio_onnx(model, params, batch: int = 1,
                      chunk_hops: int = 1) -> bytes:
    """The SERVED audio-in -> audio-out step as ONNX: online STFT ->
    streaming model step -> online iSTFT with all carried state threaded
    (``dsp/stream_dsp.make_audio_step`` — the program bench.py measures).

    The reference never ships this either way: its export wraps only the
    model and leaves STFT/iSTFT to the host (stream_onnx.py:15-129).  Here
    the transforms ride the MXU-DFT lowering (two MatMuls with the window
    and OLA envelope folded in) because opset 16 has no FFT op — and that
    is also the exact served form.  Model state is shift-mode (static
    shapes, like :func:`export_stream_onnx`).

    Inputs: "dsp.in_buf"/"dsp.ola_buf" (B,256), one per shift cache,
    "audio_in" (B, 256*T); outputs mirror with ".out" + "audio_out".  The
    output runs one hop behind the input; a fresh stream's first emitted
    chunk is the discarded center-trim region (online-DSP contract,
    dsp/stream_dsp.py:95-121).
    """
    from gtcrn_micro_tpu.dsp import stream_dsp
    from gtcrn_micro_tpu.dsp.stft import sqrt_hann_window

    window = sqrt_hann_window(model.config.win_len)
    step = stream_dsp.make_audio_step(model, window, dft="mxu")
    state = model.init_state(batch, ring=False)
    keys = sorted(state)
    dsp0 = stream_dsp.init_dsp_state(batch)
    chunk = jnp.zeros((batch, 256 * chunk_hops), jnp.float32)

    def fn(in_buf, ola_buf, state_list, c):
        st = dict(zip(keys, state_list))
        out, dsp, ms = step(
            params, stream_dsp.DspState(in_buf, ola_buf), st, c
        )
        return out, dsp.in_buf, dsp.ola_buf, [ms[k] for k in keys]

    return export_onnx(
        fn,
        (dsp0.in_buf, dsp0.ola_buf, [state[k] for k in keys], chunk),
        input_names=["dsp.in_buf", "dsp.ola_buf"] + keys + ["audio_in"],
        output_names=["audio_out", "dsp.in_buf.out", "dsp.ola_buf.out"]
        + [f"{k}.out" for k in keys],
        graph_name="gtcrn_micro_audio",
    )
