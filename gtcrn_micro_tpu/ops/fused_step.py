"""Fused Pallas streaming step: the ENTIRE per-frame model in one kernel.

The XLA streaming step is ~40 small ops, each round-tripping (B,1,33,16)
activations through HBM; at serving batch sizes that traffic dominates
(SURVEY.md §7 step 4).  This kernel computes the whole forward -- feature
stack, ERB merge, SFE, encoder, GTCN x2, decoder, ERB split, CRM mask -- for
a tile of ``tile`` streams with every activation resident in VMEM.

Ring-buffer contract (division of labor with XLA):
- the kernel takes the 2 TAP FRAMES each temporal conv needs as inputs and
  returns the ONE frame to store; the step wrapper does the ring
  dynamic_update_slice outside, which XLA performs in place on donated
  buffers.  State traffic is O(taps), never O(ring), and the kernel needs no
  DMA machinery.
- layouts are TPU-native: activations (C, F, B) with the stream batch in
  lanes; channel mixes are MXU contractions over C, frequency ops are
  sublane shifts.  Weights are packed with explicit trailing singleton dims
  (Mosaic cannot reshape 1-D vectors to higher rank in-kernel).

BatchNorms are folded into conv weights at pack time (inference affine).

Parity: oracle-tested against the XLA path (tests/ops/test_fused_step.py);
reference graph: gtcrn_micro/models/gtcrn_micro.py:485-532.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F_FULL = 257
F_ERB = 129
F_DOWN = 33
C = 16
H = C // 2  # channel-split half

# (state key, ring length L, tap stride d, frame shape minus batch)
RING_DEFS = (
    [(f"enc{i}_dw", 2, 1, (C, F_DOWN)) for i in range(3)]
    + [(f"enc{i}_tra", 2, 1, (H,)) for i in range(3)]
    + [(f"dec{i}_dw", 2, 1, (C, F_DOWN)) for i in range(3)]
    + [(f"dec{i}_tra", 2, 1, (H,)) for i in range(3)]
    + [(f"tcn{s}{j}", 2 * 2**j, 2**j, (C, F_DOWN))
       for s in range(2) for j in range(4)]
)


# ---------------------------------------------------------------------------
# weight packing (BN folded, kernel-friendly layouts)
# ---------------------------------------------------------------------------


def _bn_fold(w_out_axis_last, b, bn, eps=1e-5):
    """Fold eval-mode BatchNorm into conv weight (out-channel on the LAST
    axis) and bias."""
    s = bn["gamma"] / np.sqrt(np.asarray(bn["running_var"]) + eps)
    w = np.asarray(w_out_axis_last) * s
    b = (np.asarray(b) * s + np.asarray(bn["beta"])
         - np.asarray(bn["running_mean"]) * s)
    return w, b


def _gtconv_pack(p, deconv: bool) -> dict:
    out = {}
    w, b = _bn_fold(p["point_conv1"]["w"], p["point_conv1"]["b"], p["point_bn1"])
    out["pw1_w"] = w.T  # (16, 8)
    out["pw1_b"] = b.reshape(C, 1, 1)
    out["a1"] = np.asarray(p["point_act"]["alpha"]).reshape(1, 1)

    w, b = _bn_fold(p["depth_conv"]["w"], p["depth_conv"]["b"], p["depth_bn"])
    if deconv:  # HWIO (3,3,16,16) -> (kt, kf, Cout, Cin)
        out["dw_w"] = w.transpose(0, 1, 3, 2)
    else:  # HWIO (3,3,1,16) depthwise -> (kt*3+kf, C, 1, 1)
        out["dw_w"] = w[:, :, 0, :].reshape(9, C, 1, 1)
    out["dw_b"] = b.reshape(C, 1, 1)
    out["a2"] = np.asarray(p["depth_act"]["alpha"]).reshape(1, 1)

    w, b = _bn_fold(p["point_conv2"]["w"], p["point_conv2"]["b"], p["point_bn2"])
    out["pw2_w"] = w.T  # (8, 16)
    out["pw2_b"] = b.reshape(H, 1, 1)

    tra = p["tra"]
    out["tra_dw"] = np.asarray(tra["depth_w"]).reshape(3, H, 1)
    out["tra_db"] = np.asarray(tra["depth_b"]).reshape(H, 1)
    out["tra_pw"] = np.asarray(tra["point_w"]).T  # (8, 8)
    out["tra_pb"] = np.asarray(tra["point_b"]).reshape(H, 1)
    return out


def _tcn_pack(p) -> dict:
    out = {}
    w, b = _bn_fold(p["conv1"]["w"], p["conv1"]["b"], p["bn1"])
    out["pw1_w"], out["pw1_b"] = w.T, b.reshape(C, 1, 1)
    out["a1"] = np.asarray(p["act1"]["alpha"]).reshape(1, 1)
    # depthwise (k,1) time conv: HWIO (3,1,1,16) -> (3, C, 1, 1)
    w, b = _bn_fold(p["conv2"]["w"], p["conv2"]["b"], p["bn2"])
    out["dw_w"] = w[:, 0, 0, :].reshape(3, C, 1, 1)
    out["dw_b"] = b.reshape(C, 1, 1)
    out["a2"] = np.asarray(p["act2"]["alpha"]).reshape(1, 1)
    w, b = _bn_fold(p["conv3"]["w"], p["conv3"]["b"], p["bn3"])
    out["pw3_w"], out["pw3_b"] = w.T, b.reshape(C, 1, 1)
    out["a3"] = np.asarray(p["act3"]["alpha"]).reshape(1, 1)
    return out


def pack_weights(params, dtype=jnp.float32) -> list:
    """Flatten the model params pytree into the kernel's weight list
    (fixed order, BN folded)."""
    params = jax.tree.map(np.asarray, params)
    W: list = []

    def add(*arrs):
        W.extend(arrs)

    add(np.asarray(params["erb"]["bm_w"]).T)  # (64, 192)
    add(np.asarray(params["erb"]["bs_w"]).T)  # (192, 64)
    # SFE depthwise HWIO (1,3,1,3) -> (kf, c, 1, 1)
    add(np.asarray(params["sfe"]["depth_conv"]["w"])[0, :, 0, :]
        .reshape(3, 3, 1, 1))

    for name in ("en0", "en1"):
        p = params["encoder"][name]
        w, b = _bn_fold(p["conv"]["w"], p["conv"]["b"], p["bn"])
        add(w[0].transpose(0, 2, 1),  # (5, Cout, Cin)
            b.reshape(-1, 1, 1),
            np.asarray(p["act"]["alpha"]).reshape(1, 1))

    for name in ("en2", "en3", "en4"):
        add(*_gtconv_pack(params["encoder"][name], deconv=False).values())
    for stack in ("gtcn1", "gtcn2"):
        for j in range(4):
            add(*_tcn_pack(params[stack][f"block{j}"]).values())
    for name in ("de0", "de1", "de2"):
        add(*_gtconv_pack(params["decoder"][name], deconv=True).values())

    for name, is_last in (("de3", False), ("de4", True)):
        p = params["decoder"][name]
        w, b = _bn_fold(p["conv"]["w"], p["conv"]["b"], p["bn"])
        add(w[0].transpose(0, 2, 1), b.reshape(-1, 1, 1))  # (5, Cout, Cin)
        if not is_last:
            add(np.asarray(p["act"]["alpha"]).reshape(1, 1))

    return [jnp.asarray(w, dtype) for w in W]


_GT_KEYS = ["pw1_w", "pw1_b", "a1", "dw_w", "dw_b", "a2", "pw2_w", "pw2_b",
            "tra_dw", "tra_db", "tra_pw", "tra_pb"]
_TCN_KEYS = ["pw1_w", "pw1_b", "a1", "dw_w", "dw_b", "a2", "pw3_w", "pw3_b",
             "a3"]
_SCALAR_KEYS = {"a1", "a2", "a3", "a"}
N_WEIGHTS = 3 + 2 * 3 + 6 * len(_GT_KEYS) + 8 * len(_TCN_KEYS) + 3 + 2


def _unpack(refs, dtype=jnp.float32):
    """Mirror of pack_weights' order: refs (or plain arrays) -> nested dict
    of VALUES in the compute dtype (alpha entries become scalars)."""
    it = iter(refs)

    def nxt(key=""):
        # Pallas kernels always compute in f32 (Mosaic's bf16 lowering of
        # several vector ops crashes this tunnel's compiler); storage dtype
        # is the ref dtype, so bf16 configs still move bf16 bytes
        v = next(it)
        if key in _SCALAR_KEYS:
            return v[0, 0].astype(dtype)
        return v[...].astype(dtype)

    W = {"bm_w": nxt(), "bs_w": nxt(), "sfe_w": nxt()}
    for name in ("en0", "en1"):
        W[name] = {k: nxt(k) for k in ("w", "b", "a")}
    for name in ("en2", "en3", "en4"):
        W[name] = {k: nxt(k) for k in _GT_KEYS}
    for stack in ("gtcn1", "gtcn2"):
        for j in range(4):
            W[f"{stack}b{j}"] = {k: nxt(k) for k in _TCN_KEYS}
    for name in ("de0", "de1", "de2"):
        W[name] = {k: nxt(k) for k in _GT_KEYS}
    W["de3"] = {k: nxt(k) for k in ("w", "b", "a")}
    W["de4"] = {k: nxt(k) for k in ("w", "b")}
    return W, list(it)


# ---------------------------------------------------------------------------
# kernel compute helpers (operate on VALUES, shapes (C, F, B))
# ---------------------------------------------------------------------------


def _prelu(x, a):
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def _cdot(w, x, dtype):
    """Channel mix: (Co, Ci) @ (Ci, ...) -> (Co, ...), f32 accumulation."""
    return jax.lax.dot_general(
        w, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST
    ).astype(dtype)


def _conv5_stride2(x, w, b, a, dtype):
    """(1,5) freq conv, stride 2, pad 2 + folded bias + PReLU.
    x (Ci, F, B), w (5, Co, Ci), b (Co,1,1) -> (Co, (F-1)//2+1, B)."""
    Ci, F, B = x.shape
    out_f = (F + 4 - 5) // 2 + 1
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))
    Fp = F + 4
    if Fp % 2:
        xp = jnp.pad(xp, ((0, 0), (0, 1), (0, 0)))
        Fp += 1
    r = xp.reshape(Ci, Fp // 2, 2, B)
    ev, od = r[:, :, 0, :], r[:, :, 1, :]  # xp[2i], xp[2i+1]
    acc = jnp.zeros((w.shape[1], out_f, B), jnp.float32)
    for k in range(5):
        src = ev if k % 2 == 0 else od
        acc += jax.lax.dot_general(
            w[k], src[:, k // 2 : k // 2 + out_f, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return _prelu((acc + b).astype(dtype), a)


def _deconv5_up2(x, w, b, dtype):
    """(1,5) transposed freq conv, stride 2, pad 2 (canonical flipped-kernel
    form == lhs_dilation): x (Ci, F, B) -> (Co, 2F-1, B)."""
    Ci, F, B = x.shape
    out_f = 2 * F - 1
    xd = jnp.stack([x, jnp.zeros_like(x)], axis=2).reshape(Ci, 2 * F, B)
    xd = xd[:, : 2 * F - 1, :]
    xp = jnp.pad(xd, ((0, 0), (2, 2), (0, 0)))
    acc = jnp.zeros((w.shape[1], out_f, B), jnp.float32)
    for k in range(5):
        acc += jax.lax.dot_general(
            w[k], xp[:, k : k + out_f, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return (acc + b).astype(dtype)


def _dw_freq3(x, w9, kt, dtype):
    """Depthwise 3-tap freq conv (pad 1): x (C,F,B), w9 (9,C,1,1) row kt*3+kf."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    F = x.shape[1]
    acc = w9[kt * 3 + 0] * xp[:, 0:F, :]
    acc += w9[kt * 3 + 1] * xp[:, 1 : F + 1, :]
    acc += w9[kt * 3 + 2] * xp[:, 2 : F + 2, :]
    return acc.astype(dtype)


def _full_freq3(x, w, kt, dtype):
    """Full 3-tap freq conv (pad 1): x (Ci,F,B), w (3,3,Co,Ci) row kt."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    F = x.shape[1]
    acc = jnp.zeros((w.shape[2], F, x.shape[2]), jnp.float32)
    for kf in range(3):
        acc += jax.lax.dot_general(
            w[kt, kf], xp[:, kf : kf + F, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return acc.astype(dtype)


def _gtconv(x, W, dw_taps, tra_taps, deconv, dtype):
    """GTConvBlock (reference gtcrn_micro.py:167-253).  Returns
    (out (16,F,B), dw_frame, tra_frame)."""
    x1, x2 = x[:H], x[H:]
    h = _prelu(_cdot(W["pw1_w"], x1, dtype) + W["pw1_b"], W["a1"])

    tap0, tap1 = dw_taps  # x_{t-2}, x_{t-1}
    freq = _full_freq3 if deconv else _dw_freq3
    y = (
        freq(tap0, W["dw_w"], 0, dtype).astype(jnp.float32)
        + freq(tap1, W["dw_w"], 1, dtype)
        + freq(h, W["dw_w"], 2, dtype)
        + W["dw_b"]
    ).astype(dtype)
    h2 = _prelu(y, W["a2"])
    h3 = _cdot(W["pw2_w"], h2, dtype) + W["pw2_b"]  # (8,F,B)

    e = jnp.mean((h3 * h3).astype(jnp.float32), axis=1).astype(dtype)  # (8,B)
    e0, e1 = tra_taps  # e_{t-2}, e_{t-1}
    yg = (
        W["tra_db"]
        + W["tra_dw"][0] * e0
        + W["tra_dw"][1] * e1
        + W["tra_dw"][2] * e
    )
    # sigmoid in f32: Mosaic's bf16 logistic lowering is broken
    # ('vector.broadcast' element-type verification error)
    g = jax.nn.sigmoid(
        (_cdot(W["tra_pw"], yg, dtype) + W["tra_pb"]).astype(jnp.float32)
    ).astype(dtype)
    h4 = h3 * g[:, None, :]
    out = jnp.stack([h4, x2], axis=1).reshape(C, x.shape[1], x.shape[2])
    return out, h, e


def _tcn(x, W, taps, dtype):
    """Residual TCN block (reference :256-310).  Returns (out, ring frame)."""
    h = _prelu(_cdot(W["pw1_w"], x, dtype) + W["pw1_b"], W["a1"])
    tap0, tap1 = taps  # x_{t-2d}, x_{t-d}
    y = (
        W["dw_w"][0] * tap0
        + W["dw_w"][1] * tap1
        + W["dw_w"][2] * h
        + W["dw_b"]
    )
    h2 = _prelu(y.astype(dtype), W["a2"])
    h3 = _cdot(W["pw3_w"], h2, dtype) + W["pw3_b"]
    return _prelu(h3 + x, W["a3"]), h


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _forward_values(W, spec, taps, dtype, frames=None):
    """The whole forward on VALUES: spec (2,257,B) + taps -> (out, frames).
    Shared by the Pallas kernels and the layout-optimized plain-XLA path.
    ``taps`` may be any mapping (v2 passes a lazy DMA fetcher); ``frames``
    may be a sink object with __setitem__ (v2 DMA-writes immediately)."""
    re, im = spec[0], spec[1]
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    if frames is None:
        frames = {}

    # ERB band merge per feature channel (reference :63-67,512-517)
    feats = []
    for ch in (mag, re, im):
        hi = jax.lax.dot_general(
            W["bm_w"], ch[65:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(dtype)
        feats.append(jnp.concatenate([ch[:65], hi], axis=0))
    x = jnp.stack(feats)  # (3, 129, B)

    # SFE-Lite: depthwise 3-tap freq conv, no bias (reference :77-90)
    sfe = W["sfe_w"]  # (kf, c, 1, 1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    x = (
        sfe[0] * xp[:, 0:F_ERB, :]
        + sfe[1] * xp[:, 1 : F_ERB + 1, :]
        + sfe[2] * xp[:, 2 : F_ERB + 2, :]
    ).astype(dtype)

    # encoder
    skips = []
    x = _conv5_stride2(x, W["en0"]["w"], W["en0"]["b"], W["en0"]["a"], dtype)
    skips.append(x)  # (16, 65, B)
    x = _conv5_stride2(x, W["en1"]["w"], W["en1"]["b"], W["en1"]["a"], dtype)
    skips.append(x)  # (16, 33, B)
    for i, name in enumerate(("en2", "en3", "en4")):
        x, dw_f, tra_f = _gtconv(
            x, W[name], taps[f"enc{i}_dw"], taps[f"enc{i}_tra"], False, dtype
        )
        frames[f"enc{i}_dw"] = dw_f
        frames[f"enc{i}_tra"] = tra_f
        skips.append(x)

    # GTCN x2
    for s, stack in enumerate(("gtcn1", "gtcn2")):
        for j in range(4):
            x, frame = _tcn(x, W[f"{stack}b{j}"], taps[f"tcn{s}{j}"], dtype)
            frames[f"tcn{s}{j}"] = frame

    # decoder (additive skips, reference :468)
    for i, name in enumerate(("de0", "de1", "de2")):
        x, dw_f, tra_f = _gtconv(
            x + skips[4 - i], W[name], taps[f"dec{i}_dw"],
            taps[f"dec{i}_tra"], True, dtype,
        )
        frames[f"dec{i}_dw"] = dw_f
        frames[f"dec{i}_tra"] = tra_f
    x = _deconv5_up2(x + skips[1], W["de3"]["w"], W["de3"]["b"], dtype)
    x = _prelu(x, W["de3"]["a"])  # (16, 65, B)
    x = _deconv5_up2(x + skips[0], W["de4"]["w"], W["de4"]["b"], dtype)
    m = jnp.tanh(x.astype(jnp.float32)).astype(dtype)  # (2, 129, B)

    # ERB band split + CRM mask (reference :69-73, :472-482)
    outs = []
    for ch in range(2):
        hi = jax.lax.dot_general(
            W["bs_w"], m[ch, 65:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(dtype)
        outs.append(jnp.concatenate([m[ch, :65], hi], axis=0))
    m_r, m_i = outs
    out = jnp.stack([re * m_r - im * m_i, im * m_r + re * m_i])
    return out, frames


def _kernel(*refs):
    W, rest = _unpack(refs)
    it = iter(rest)
    spec_ref = next(it)
    taps = {}
    for name, _L, _d, _shape in RING_DEFS:
        taps[name] = (
            next(it)[...].astype(jnp.float32),
            next(it)[...].astype(jnp.float32),
        )
    out_ref = next(it)
    frame_refs = {name: next(it) for name, *_ in RING_DEFS}

    spec = spec_ref[...].astype(jnp.float32)
    out, frames = _forward_values(W, spec, taps, jnp.float32)
    out_ref[...] = out.astype(out_ref.dtype)
    for name, *_ in RING_DEFS:
        frame_refs[name][...] = frames[name].astype(frame_refs[name].dtype)


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------


def _fused_call_tile(weights, spec_t, taps_flat, interpret: bool = False):
    """One pallas_call for ONE batch tile (grid=1: this TPU tunnel's compile
    helper crashes when blocked operands double-buffer under a grid, so
    FusedGTCRNMicro.step unrolls independent per-tile calls; the grid+DMA
    design lives in ops/fused_grid.py)."""
    tile = spec_t.shape[-1]
    dtype = spec_t.dtype
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct((2, F_FULL, tile), dtype)]
    for _name, _L, _d, shape in RING_DEFS:
        out_shapes.append(jax.ShapeDtypeStruct(shape + (tile,), dtype))

    return pl.pallas_call(
        _kernel,
        out_shape=tuple(out_shapes),
        in_specs=[vm] * (len(weights) + 1 + len(taps_flat)),
        out_specs=tuple([vm] * len(out_shapes)),
        interpret=interpret,
    )(*weights, spec_t, *taps_flat)


class FusedGTCRNMicro:
    """Drop-in serving model: same step protocol as GTCRNMicro but the whole
    per-frame forward is one Pallas kernel.  fp32 or bf16."""

    def __init__(self, params, dtype=jnp.float32, tile: int = 128,
                 interpret: bool = False):
        from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicroConfig

        self.config = GTCRNMicroConfig()
        self.dtype = dtype
        self.tile = tile
        self.interpret = interpret  # CPU testing (no Mosaic backend)
        self.weights = pack_weights(params, dtype)

    def init_state(self, batch: int, dtype=None) -> dict:
        """Rings stored TILE-MAJOR: (L, n_tiles, *frame_shape, tile), so the
        per-tile kernel slices need no relayout copies."""
        dtype = dtype or self.dtype
        assert batch % self.tile == 0, (batch, self.tile)
        nt = batch // self.tile
        state = {
            name: jnp.zeros((L, nt) + shape + (self.tile,), dtype)
            for name, L, _d, shape in RING_DEFS
        }
        state["step"] = jnp.zeros((), jnp.int32)
        return state

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
    def step(self, params, state: dict, spec):
        """spec (B, 257, 1, 2) -> (enhanced same shape, new state).
        ``params`` is ignored (weights are packed in); kept for protocol
        compatibility with GTCRNMicro."""
        del params
        t = state["step"]
        B = spec.shape[0]
        nt = B // self.tile
        # (B,257,2) -> (nt, 2, 257, tile)
        spec_t = (
            spec[:, :, 0, :]
            .reshape(nt, self.tile, F_FULL, 2)
            .transpose(0, 3, 2, 1)
            .astype(self.dtype)
        )

        taps = []  # per ring: (nt, *frame, tile) pair
        for name, L, d, _shape in RING_DEFS:
            ring = state[name]
            s0 = jax.lax.rem(t, L)
            s1 = jax.lax.rem(t + d, L)
            taps.append((
                jax.lax.dynamic_index_in_dim(ring, s0, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(ring, s1, 0, keepdims=False),
            ))

        # unrolled per-tile kernel calls: tiles are independent, so XLA can
        # pipeline them (lax.map would serialize with loop overhead; a
        # batch grid crashes this tunnel's Mosaic when blocks double-buffer)
        out_tiles, frame_tiles = [], [[] for _ in RING_DEFS]
        for i in range(nt):
            taps_i = tuple(
                tp[j][i] for tp in taps for j in range(2)
            )
            outs = _fused_call_tile(
                self.weights, spec_t[i], taps_i, self.interpret
            )
            out_tiles.append(outs[0])
            for r, frame in enumerate(outs[1:]):
                frame_tiles[r].append(frame)

        new_state = {}
        for r, (name, L, _d, _shape) in enumerate(RING_DEFS):
            frames = jnp.stack(frame_tiles[r])  # (nt, *frame, tile)
            new_state[name] = jax.lax.dynamic_update_slice_in_dim(
                state[name], frames[None], jax.lax.rem(t, L), axis=0
            )
        new_state["step"] = (t + 1) & 15

        out = jnp.stack(out_tiles)  # (nt, 2, 257, tile)
        out = out.transpose(0, 3, 2, 1).reshape(B, F_FULL, 2)
        return out[:, :, None, :], new_state


class LayoutGTCRNMicro:
    """Layout-optimized plain-XLA serving step.

    Identical math and (C, F, B)-lanes-on-batch layout as the fused Pallas
    kernel (`_forward_values` is shared), but compiled by XLA: every
    elementwise op runs with the stream batch in lanes instead of the NHWC
    path's C=16 (7/8 of each vector register wasted).  Works in bf16
    end-to-end (no Mosaic involved).
    """

    def __init__(self, params, dtype=jnp.float32):
        from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicroConfig

        self.config = GTCRNMicroConfig()
        self.dtype = dtype
        self.weights = pack_weights(params, dtype)

    def init_state(self, batch: int, dtype=None) -> dict:
        dtype = dtype or self.dtype
        state = {
            name: jnp.zeros((L,) + shape + (batch,), dtype)
            for name, L, _d, shape in RING_DEFS
        }
        state["step"] = jnp.zeros((), jnp.int32)
        return state

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
    def step(self, params, state: dict, spec):
        """spec (B, 257, 1, 2) -> (enhanced same shape, new state)."""
        del params
        t = state["step"]
        spec_t = spec[:, :, 0, :].transpose(2, 1, 0).astype(self.dtype)

        taps = {}
        for name, L, d, _shape in RING_DEFS:
            ring = state[name]
            s0 = jax.lax.rem(t, L)
            s1 = jax.lax.rem(t + d, L)
            taps[name] = (
                jax.lax.dynamic_index_in_dim(ring, s0, 0, keepdims=False)
                .astype(self.dtype),
                jax.lax.dynamic_index_in_dim(ring, s1, 0, keepdims=False)
                .astype(self.dtype),
            )

        W, _ = _unpack(self.weights, self.dtype)
        out, frames = _forward_values(W, spec_t, taps, self.dtype)

        new_state = {}
        for name, L, _d, _shape in RING_DEFS:
            new_state[name] = jax.lax.dynamic_update_slice_in_dim(
                state[name], frames[name][None].astype(state[name].dtype),
                jax.lax.rem(t, L), axis=0,
            )
        new_state["step"] = (t + 1) & 15
        return out.transpose(2, 1, 0)[:, :, None, :], new_state
