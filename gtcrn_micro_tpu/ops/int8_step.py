"""Full-integer int8 serving step: int8 storage + int8 MXU dots (XLA path).

VERDICT r1 item 1: the bf16 ring serving step is bound by intermediate
activations round-tripping HBM at every conv/dot boundary (~180 KB/stream-
step measured vs the ~45 KB tap+write floor; scripts/profile_serving.py).
This path stores the main-chain intermediates AND ring buffers as int8 --
half the bytes of bf16 -- and computes channel mixes as int8 x int8 -> int32
``dot_general`` on the MXU, with the dequant/bias/PReLU/requant chain fused
into each dot's epilogue (the round-1 failure stored int8 but dequantized
into a separate elementwise pass, which ADDED traffic; PERF.md).

Quantization semantics == quant/ptq.FakeQuantizer on BN-folded params (the
same scheme the GTM8 native artifact executes, io/export_native.py): per-
out-channel symmetric int8 weights, per-tensor asymmetric int8 activations
at the calibrated boundaries (59 paths).  Values that the simulation keeps
in fp32 stay fp32 here: GTConv inter-block handoffs (only the active half is
a quant boundary), residual/skip carriers, the TRA gate vectors and the
ERB/mask head -- so this path's quality IS the EVAL.md int8 row (and
improves with QAT, quant/qat.py).

Reference counterpart: the int8 TFLite artifact + TFLM interpreter
(scripts/onnx2tf.sh:50-64, esp32_s3/main/main.cc) -- here as a jit-compiled
XLA program serving thousands of streams per chip.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

F_FULL, F_ERB, F_65, F_33, C, H = 257, 129, 65, 33, 16, 8

_GT_NAMES = ("en2", "en3", "en4", "de0", "de1", "de2")
_TCN_DIL = (1, 2, 4, 8, 1, 2, 4, 8)


def _wq(w: np.ndarray, axis: int):
    """Per-out-channel symmetric int8 (bit-matching quant.weight_qparams)."""
    w = np.asarray(w, np.float32)
    red = tuple(i for i in range(w.ndim) if i != axis)
    amax = np.abs(w).max(axis=red)
    scale = np.maximum(
        (amax / np.float32(127.0)).astype(np.float32), np.float32(1e-12)
    )
    shape = [1] * w.ndim
    shape[axis] = w.shape[axis]
    q = np.clip(np.rint(w / scale.reshape(shape)), -128, 127).astype(np.int8)
    return q, scale


@dataclasses.dataclass(frozen=True)
class _Act:
    scale: float
    zero: int

    @property
    def inv(self) -> float:
        return float(np.float32(1.0) / np.float32(self.scale))


def _act(qp) -> _Act:
    assert int(qp.qmax) == 127, "int8 serving needs act_bits=8 qparams"
    return _Act(float(qp.scale), int(qp.zero))


def _quant(x, a: _Act):
    """f32 -> int8 in ``a``'s grid (fuses into the producer's epilogue).

    Same float math as quant.fake_quant (divide, round-half-even, add zero)
    so this path bit-matches the PTQ/QAT simulation."""
    q = jnp.round(x / jnp.float32(a.scale)) + jnp.float32(a.zero)
    return jnp.clip(q, -128, 127).astype(jnp.int8)


def _prelu(x, alpha):
    return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def _pad_f(q, a: _Act, pad: tuple[int, int]):
    """Pad the freq axis with the ZERO POINT (a float 0, not int8 0)."""
    return jnp.pad(q, ((0, 0), pad, (0, 0)), constant_values=a.zero)


_I8DOT = (((2,), (0,)), ((), ()))


def _i8dot(q, wq):
    """int8 x int8 -> int32 MXU contraction; operands STAY int8 (centring
    the activation first would materialise an int32 intermediate and defeat
    the traffic halving -- zero points are corrected in the epilogue via the
    precomputed per-out-channel weight column sums)."""
    return jax.lax.dot_general(
        q, wq, _I8DOT, preferred_element_type=jnp.int32
    )


def _epilogue(acc, a: _Act, colsum, scale, bias):
    """(acc - z * colsum) * (s_in * s_w) + b, fused into the dot output."""
    corr = acc - jnp.int32(a.zero) * colsum
    return corr.astype(jnp.float32) * (jnp.float32(a.scale) * scale) + bias


def _pw(q, a: _Act, w: dict):
    """Pointwise channel mix: int8 (B,F,Ci) x int8 (Ci,Co) -> f32 (B,F,Co)."""
    return _epilogue(_i8dot(q, w["w"]), a, w["cs"], w["s"], w["b"])


def _conv5_s2(q, a: _Act, w: dict, f_out: int):
    """(1,5) stride-2 freq conv as im2col + int8 dot.  w["w"]: (5*Ci, Co).

    Padding uses the zero point, so the padded taps cancel exactly in the
    epilogue's z*colsum correction (zero-pad == zero contribution)."""
    qp = _pad_f(q, a, (2, 2))
    taps = jnp.concatenate(
        [qp[:, k : k + 2 * f_out : 2, :] for k in range(5)], axis=-1
    )
    return _epilogue(_i8dot(taps, w["w"]), a, w["cs"], w["s"], w["b"])


def _deconv5_up2(q, a: _Act, w: dict):
    """(1,5) transposed freq conv, stride 2: split by output parity into two
    im2col int8 dots (even outputs use w[0],w[2],w[4]; odd use w[1],w[3])
    and interleave -- no materialised zero-stuffing.

    q: (B, F, Ci) -> f32 (B, 2F-1, Co)."""
    B, F, _ci = q.shape
    qp = _pad_f(q, a, (1, 1))
    even_taps = jnp.concatenate(
        [qp[:, k : k + F, :] for k in range(3)], axis=-1
    )  # x[g-1], x[g], x[g+1] for g in [0, F)
    odd_taps = jnp.concatenate(
        [qp[:, 1 : F, :], qp[:, 2 : F + 1, :]], axis=-1
    )  # x[g], x[g+1] for g in [0, F-1)
    acc_e = _epilogue(_i8dot(even_taps, w["we"]), a, w["cse"], w["s"], w["b"])
    acc_o = _epilogue(_i8dot(odd_taps, w["wo"]), a, w["cso"], w["s"], w["b"])
    co = acc_e.shape[-1]
    acc_o = jnp.pad(acc_o, ((0, 0), (0, 1), (0, 0)))
    inter = jnp.stack([acc_e, acc_o], axis=2).reshape(B, 2 * F, co)
    return inter[:, : 2 * F - 1]


def _dw_freq3(q_taps, a: _Act, w: dict):
    """Depthwise 3x3 (enc GTConv): per time tap, 3-tap freq conv per channel.

    q_taps: list of (B, F, C) int8 (oldest..current); w["w"]: (kt, 3, C).
    Elementwise integer chain -- (q - z) here FUSES (no dot involved)."""
    acc = None
    w3s = w["w"]
    z = jnp.int32(a.zero)
    for kt, q in enumerate(q_taps):
        qp = _pad_f(q, a, (1, 1)).astype(jnp.int32) - z
        for kf in range(3):
            term = qp[:, kf : kf + F_33, :] * w3s[kt, kf]
            acc = term if acc is None else acc + term
    return acc.astype(jnp.float32) * (jnp.float32(a.scale) * w["s"]) + w["b"]


def _dw_full3(q_taps, a: _Act, w: dict):
    """Full 3x3 conv (dec GTConv): per time tap an im2col int8 freq dot.

    w["w"]: (kt, 3*Ci, Co) int8, w["cs"]: (kt, Co) column sums."""
    acc = None
    for kt, q in enumerate(q_taps):
        qp = _pad_f(q, a, (1, 1))
        taps = jnp.concatenate(
            [qp[:, kf : kf + F_33, :] for kf in range(3)], axis=-1
        )
        term = _i8dot(taps, w["w"][kt]) - jnp.int32(a.zero) * w["cs"][kt]
        acc = term if acc is None else acc + term
    return acc.astype(jnp.float32) * (jnp.float32(a.scale) * w["s"]) + w["b"]


def _dw_time3(q_taps, a: _Act, w: dict):
    """Depthwise k=3 time conv (TCN): elementwise integer taps.

    w["w"]: (3, C) int32."""
    acc = None
    z = jnp.int32(a.zero)
    for kt, q in enumerate(q_taps):
        term = (q.astype(jnp.int32) - z) * w["w"][kt]
        acc = term if acc is None else acc + term
    return acc.astype(jnp.float32) * (jnp.float32(a.scale) * w["s"]) + w["b"]


def _fq(x, qp):
    """Scalar-path fake-quant (tiny TRA vectors: traffic-irrelevant, so use
    the simulation's float math verbatim)."""
    q = jnp.clip(jnp.round(x / qp.scale) + qp.zero, qp.qmin, qp.qmax)
    return (q - qp.zero) * qp.scale


class Int8Serving:
    """Prepared int8 serving program: ``init_state`` + ``step``.

    Built from fp32 params (BN folded internally) and calibrated act qparams
    (``quant.qat.calibrate_act_qparams`` / ``quant.ptq.observe_ranges``).
    """

    def __init__(self, model, params, act_qp: dict, carry_dtype=jnp.bfloat16):
        from gtcrn_micro_tpu.models.folding import fold_bn_params

        self.model = model
        self.act_qp = act_qp
        self.carry_dtype = carry_dtype
        p = jax.tree.map(np.asarray, fold_bn_params(params))
        W: dict = {}

        def cs(q):  # per-out-channel zero-point correction: sum over Ci
            return q.astype(np.int32).sum(axis=0)

        W["bm"] = np.asarray(p["erb"]["bm_w"], np.float32)  # (192, 64)
        W["bs"] = np.asarray(p["erb"]["bs_w"], np.float32)  # (64, 192)

        # sfe: HWIO (1,3,1,3) depthwise -> (3, c) int32 rows
        q, s = _wq(np.asarray(p["sfe"]["depth_conv"]["w"]), 3)
        W["sfe"] = dict(w=q[0, :, 0, :].astype(np.int32), s=s)

        for name in ("en0", "en1"):
            blk = p["encoder"][name]
            q, s = _wq(blk["conv"]["w"], 3)  # HWIO (1,5,Ci,Co)
            ci = q.shape[2]
            w = q[0].reshape(5 * ci, -1)  # (5*Ci, Co)
            W[name] = dict(
                w=w, cs=cs(w), s=s,
                b=np.asarray(blk["conv"]["b"], np.float32),
                a=float(blk["act"]["alpha"]),
            )

        for name in _GT_NAMES:
            root = p["encoder" if name.startswith("en") else "decoder"][name]
            g: dict = {}
            q, s = _wq(root["point_conv1"]["w"], 1)
            g["pw1"] = dict(w=q, cs=cs(q), s=s,
                            b=np.asarray(root["point_conv1"]["b"], np.float32),
                            a=float(root["point_act"]["alpha"]))
            dw = np.asarray(root["depth_conv"]["w"])  # HWIO (3,3,Ci/g,16)
            q, s = _wq(dw, 3)
            if dw.shape[2] == 1:  # encoder depthwise -> (kt, kf, C) int32
                g["dw"] = dict(w=q[:, :, 0, :].astype(np.int32), s=s,
                               full=False)
            else:  # decoder full conv -> (kt, 3*Ci, Co) int8 + per-kt colsums
                w = q.reshape(3, 3 * C, C)
                g["dw"] = dict(
                    w=w, cs=np.stack([cs(w[kt]) for kt in range(3)]), s=s,
                    full=True,
                )
            g["dw"]["b"] = np.asarray(root["depth_conv"]["b"], np.float32)
            g["dw"]["a"] = float(root["depth_act"]["alpha"])
            q, s = _wq(root["point_conv2"]["w"], 1)
            g["pw2"] = dict(w=q, cs=cs(q), s=s,
                            b=np.asarray(root["point_conv2"]["b"], np.float32))
            g["tra"] = jax.tree.map(np.asarray, dict(root["tra"]))
            W[name] = g

        for stack in ("gtcn1", "gtcn2"):
            for j in range(4):
                blk = p[stack][f"block{j}"]
                t: dict = {}
                for key, conv, act in (
                    ("pw1", "conv1", "act1"), ("pw3", "conv3", "act3")
                ):
                    q, s = _wq(blk[conv]["w"], 1)
                    t[key] = dict(w=q, cs=cs(q), s=s,
                                  b=np.asarray(blk[conv]["b"], np.float32),
                                  a=float(blk[act]["alpha"]))
                q, s = _wq(blk["conv2"]["w"], 3)  # HWIO (3,1,1,16)
                t["dw"] = dict(w=q[:, 0, 0, :].astype(np.int32), s=s,
                               b=np.asarray(blk["conv2"]["b"], np.float32),
                               a=float(blk["act2"]["alpha"]))
                W[f"{stack}b{j}"] = t

        for name in ("de3", "de4"):
            blk = p["decoder"][name]
            q, s = _wq(blk["conv"]["w"], 3)  # canonical HWIO (1,5,Ci,Co)
            we = np.concatenate([q[0, k] for k in (0, 2, 4)], 0)  # (3Ci, Co)
            wo = np.concatenate([q[0, k] for k in (1, 3)], 0)     # (2Ci, Co)
            W[name] = dict(
                we=we, wo=wo, cse=cs(we), cso=cs(wo),
                s=s, b=np.asarray(blk["conv"]["b"], np.float32),
                a=float(blk["act"]["alpha"]) if name == "de3" else 0.0,
            )
        self.W = jax.tree.map(
            lambda v: jnp.asarray(v) if isinstance(v, np.ndarray) else v, W
        )
        self.A = {k: _act(v) for k, v in act_qp.items()}

    # -- state ---------------------------------------------------------------

    def init_state(self, batch: int) -> dict:
        st: dict = {"step": jnp.zeros((), jnp.int32)}

        def ring(path: str, L: int, f: int, c: int):
            z = self.A[path].zero
            st[path] = jnp.full((batch, L, f, c), z, jnp.int8)

        for name in _GT_NAMES:
            side = "encoder" if name.startswith("en") else "decoder"
            ring(f"{side}/{name}/depth_conv/in", 2, F_33, C)
            ez = self.A[f"{side}/{name}/tra/energy"].zero
            st[f"{side}/{name}/tra/ring"] = jnp.full(
                (batch, 2, H), ez, jnp.int8
            )
        for i, (stack, j) in enumerate(
            (s, j) for s in ("gtcn1", "gtcn2") for j in range(4)
        ):
            ring(f"{stack}/block{j}/conv2/in", 2 * _TCN_DIL[i], F_33, C)
        return st

    # -- building blocks -------------------------------------------------------

    def _gtconv(self, name: str, x, st, new, t):
        """x: (B,33,16) f32 -> same.  Encoder/decoder GTConvBlock."""
        side = "encoder" if name.startswith("en") else "decoder"
        g = self.W[name]
        a_pw1 = self.A[f"{side}/{name}/pw1/in"]
        a_dw = self.A[f"{side}/{name}/depth_conv/in"]
        a_pw2 = self.A[f"{side}/{name}/pw2/in"]

        q1 = _quant(x[..., :H], a_pw1)
        h = _prelu(_pw(q1, a_pw1, g["pw1"]), g["pw1"]["a"])
        qh = _quant(h, a_dw)

        key = f"{side}/{name}/depth_conv/in"
        ring = st[key]
        t0 = jax.lax.rem(t, 2)
        t1 = jax.lax.rem(t + 1, 2)
        tap0 = jax.lax.dynamic_slice_in_dim(ring, t0, 1, axis=1)[:, 0]
        tap1 = jax.lax.dynamic_slice_in_dim(ring, t1, 1, axis=1)[:, 0]
        new[key] = jax.lax.dynamic_update_slice_in_dim(
            ring, qh[:, None], t0, axis=1
        )
        taps = [tap0, tap1, qh]
        if g["dw"]["full"]:
            y = _dw_full3(taps, a_dw, g["dw"])
        else:
            y = _dw_freq3(taps, a_dw, g["dw"])
        y = _prelu(y, g["dw"]["a"])

        qy = _quant(y, a_pw2)
        h3 = _pw(qy, a_pw2, g["pw2"])

        # TRA gate (8-wide vectors: simulation float math verbatim)
        tra = g["tra"]
        e = jnp.mean(h3 * h3, axis=1)  # (B, 8)
        e = _fq(e, self.act_qp[f"{side}/{name}/tra/energy"])
        ekey = f"{side}/{name}/tra/ring"
        ering = st[ekey]
        ez = self.A[f"{side}/{name}/tra/energy"]
        e0 = jax.lax.dynamic_slice_in_dim(ering, t0, 1, axis=1)[:, 0]
        e1 = jax.lax.dynamic_slice_in_dim(ering, t1, 1, axis=1)[:, 0]
        new[ekey] = jax.lax.dynamic_update_slice_in_dim(
            ering, _quant(e, ez)[:, None], t0, axis=1
        )
        dw_fq = _fq(tra["depth_w"], _wqp(tra["depth_w"], 1))
        e0f = (e0.astype(jnp.float32) - ez.zero) * jnp.float32(ez.scale)
        e1f = (e1.astype(jnp.float32) - ez.zero) * jnp.float32(ez.scale)
        yg = tra["depth_b"] + e0f * dw_fq[0] + e1f * dw_fq[1] + e * dw_fq[2]
        yg = _fq(yg, self.act_qp[f"{side}/{name}/tra/gate_in"])
        pw_fq = _fq(tra["point_w"], _wqp(tra["point_w"], 1))
        gate = jax.nn.sigmoid(yg @ pw_fq + tra["point_b"])

        gated = h3 * gate[:, None, :]
        # channel shuffle: interleave gated (even) with the passive half (odd)
        B = x.shape[0]
        out = jnp.stack([gated, x[..., H:]], axis=-1).reshape(B, F_33, C)
        return out

    def _tcn(self, idx: int, x, st, new, t):
        stack = "gtcn1" if idx < 4 else "gtcn2"
        j = idx % 4
        d = _TCN_DIL[idx]
        L = 2 * d
        w = self.W[f"{stack}b{j}"]
        a1 = self.A[f"{stack}/block{j}/pw1/in"]
        ad = self.A[f"{stack}/block{j}/conv2/in"]
        a3 = self.A[f"{stack}/block{j}/pw3/in"]

        q = _quant(x, a1)
        h = _prelu(_pw(q, a1, w["pw1"]), w["pw1"]["a"])
        qh = _quant(h, ad)
        key = f"{stack}/block{j}/conv2/in"
        ring = st[key]
        s0 = jax.lax.rem(t, L)
        tap0 = jax.lax.dynamic_slice_in_dim(ring, s0, 1, axis=1)[:, 0]
        s1 = jax.lax.rem(t + d, L)
        tap1 = jax.lax.dynamic_slice_in_dim(ring, s1, 1, axis=1)[:, 0]
        new[key] = jax.lax.dynamic_update_slice_in_dim(
            ring, qh[:, None], s0, axis=1
        )
        y = _prelu(_dw_time3([tap0, tap1, qh], ad, w["dw"]), w["dw"]["a"])
        qy = _quant(y, a3)
        h3 = _pw(qy, a3, w["pw3"])
        return _prelu(h3 + x, w["pw3"]["a"])

    # -- the step --------------------------------------------------------------

    def step(self, state: dict, spec):
        """spec (B, 257, 1, 2) -> (enhanced (B, 257, 1, 2), new state)."""
        t = state["step"]
        new: dict = {}
        x = spec[:, :, 0, :].astype(jnp.float32)  # (B, 257, 2)
        real, imag = x[..., 0], x[..., 1]
        mag = jnp.sqrt(real * real + imag * imag + 1e-12)
        chans = jnp.stack([mag, real, imag], axis=-1)  # (B, 257, 3)
        lo, hi = chans[:, :F_65, :], chans[:, F_65:, :]
        erb = jnp.einsum(
            "bfc,fe->bec", hi, self.W["bm"],
            precision=jax.lax.Precision.HIGHEST,
        )
        feat = jnp.concatenate([lo, erb], axis=1)  # (B, 129, 3)

        a_sfe = self.A["sfe/depth_conv/in"]
        qf = _quant(feat, a_sfe)
        sfe = _dw_freq3_single(qf, a_sfe, self.W["sfe"]["w"],
                               self.W["sfe"]["s"])

        a0 = self.A["encoder/en0/conv/in"]
        en0 = self.W["en0"]
        skip0 = _prelu(_conv5_s2(_quant(sfe, a0), a0, en0, F_65), en0["a"])
        a1 = self.A["encoder/en1/conv/in"]
        en1 = self.W["en1"]
        skip1 = _prelu(_conv5_s2(_quant(skip0, a1), a1, en1, F_33), en1["a"])
        skip0 = skip0.astype(self.carry_dtype)

        x = skip1
        skips = []
        for name in ("en2", "en3", "en4"):
            x = self._gtconv(name, x, state, new, t)
            skips.append(x.astype(self.carry_dtype))
        for i in range(8):
            x = self._tcn(i, x, state, new, t)
        for i, name in enumerate(("de0", "de1", "de2")):
            x = x + skips[2 - i].astype(jnp.float32)
            x = self._gtconv(name, x, state, new, t)
        x = x + skip1

        a3 = self.A["decoder/de3/conv/in"]
        x65 = _prelu(
            _deconv5_up2(_quant(x, a3), a3, self.W["de3"]),
            self.W["de3"]["a"],
        )
        x65 = x65 + skip0.astype(jnp.float32)
        a4 = self.A["decoder/de4/conv/in"]
        m = jnp.tanh(
            _deconv5_up2(_quant(x65, a4), a4, self.W["de4"])
        )  # (B, 129, 2)

        m_lo, m_hi = m[:, :F_65, :], m[:, F_65:, :]
        m_full = jnp.concatenate(
            [m_lo, jnp.einsum("bec,ef->bfc", m_hi, self.W["bs"],
                              precision=jax.lax.Precision.HIGHEST)],
            axis=1,
        )  # (B, 257, 2)
        m_r, m_i = m_full[..., 0], m_full[..., 1]
        s_r = real * m_r - imag * m_i
        s_i = imag * m_r + real * m_i
        out = jnp.stack([s_r, s_i], axis=-1)[:, :, None, :]
        new["step"] = (t + 1) & 15
        for k in state:
            new.setdefault(k, state[k])
        return out.astype(spec.dtype), new


def _wqp(w, axis: int):
    """weight_qparams (JAX) -- imported lazily to avoid a cycle."""
    from gtcrn_micro_tpu.quant.fake_quant import weight_qparams

    return weight_qparams(w, axis)


def _dw_freq3_single(q, a: _Act, w3, scale):
    """SFE: single-time-tap depthwise 3-tap freq conv, no bias."""
    qp = _pad_f(q, a, (1, 1)).astype(jnp.int32) - jnp.int32(a.zero)
    acc = None
    for kf in range(3):
        term = qp[:, kf : kf + F_ERB, :] * w3[kf]
        acc = term if acc is None else acc + term
    return acc.astype(jnp.float32) * (jnp.float32(a.scale) * scale)
