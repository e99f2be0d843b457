"""GPTQ weight rounding on deploy activation grids (per-layer OBS).

Why this exists (EVAL.md r4/r4b): AdaRound's END-TO-END distillation
objective overfits its train distribution (it measured −11 dB held-out on
the a8 grid and strictly negative ON per-channel grids), while the GTM8
v3 artifact is weight-rounding-bound: nearest w8 costs ~4.6 dB held-out
against the a16 per-channel acts-only ceiling (29.7 vs 34.3 dB).  GPTQ
(Frantar et al. 2023, the OBS/OBQ line) minimizes each layer's LOCAL
output reconstruction error ``||X W − X W_q||²`` on calibration data —
per-layer least squares with no end-to-end co-adaptation mechanism, so it
cannot trade held-out fidelity for train fit the way the global
objectives measured here did.

Method per weighted boundary (the 59 of quant/ptq.py's inventory):

1. capture the boundary's DEPLOY input X — after activation fake-quant on
   the target grid, with every upstream weight already quantized (the
   standard sequential GPTQ schedule).  Inputs are captured from an eager
   forward with ``jax.lax.conv_general_dilated`` intercepted, so each
   conv boundary's exact geometry (strides / padding / lhs- and
   rhs-dilation / groups — including the lhs-dilated deconvs) comes from
   the call itself, never from a hand-maintained table, and the patch
   algebra is self-checked against the recorded conv output.
2. H = XᵀX over calibration positions (per conv GROUP: all output
   channels of a group share one patch matrix).
3. quantize fan-in entries one at a time onto the FROZEN per-out-channel
   symmetric int8 grid (``weight_qparams`` of the ORIGINAL folded weight),
   propagating each rounding error to the not-yet-quantized entries
   through the Cholesky factor of H⁻¹.  Each channel's abs-max entries are
   pinned to nearest and q is clipped to ±127 (quant/adaround._pin_mask's
   invariant), so the baked weights re-observe the identical scale and
   survive export_native requantization bit-exactly.

Reference counterpart: none (the reference ships nearest-rounding PTQ via
onnx2tf, scripts/onnx2tf.sh) — a beyond-reference addition in the same
family as quant/adaround.py.  Numbers: EVAL.md "GPTQ" (r4b).
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gtcrn_micro_tpu.nn.core import Ctx
from gtcrn_micro_tpu.quant.adaround import _scope_matches, _unflatten_like
from gtcrn_micro_tpu.quant.fake_quant import fake_quant, weight_qparams

INT_LO, INT_HI = -127, 127  # symmetric: keeps per-channel amax invariant


# ---------------------------------------------------------------------------
# Capture: deploy inputs + exact conv geometry per boundary
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _Boundary:
    path: str
    leaf: str
    w: np.ndarray  # param-space weight as seen by the hook
    channel_axis: int
    x: np.ndarray | None = None  # deploy-quantized input (retained only)
    cfg: dict | None = None  # conv_general_dilated kwargs (conv boundaries)
    out: np.ndarray | None = None  # conv output (patch-algebra self-check)


class _CaptureHook:
    """ctx.quant hook: applies deploy activation fake-quant and records
    each weight boundary's (path, w, channel_axis, input)."""

    def __init__(self, act_qp: dict, retain: set[str] | None):
        self.act_qp = act_qp
        self.retain = retain  # None = retain all
        self.records: list[_Boundary] = []
        self.pending: dict[int, _Boundary | None] = {}
        self._last_x = None

    def act(self, ctx: Ctx, leaf: str, x):
        xq = fake_quant(x, self.act_qp[ctx.path(leaf)])
        self._last_x = xq
        return xq

    def weight(self, ctx: Ctx, leaf: str, w, channel_axis: int):
        path = ctx.path(leaf)
        keep = self.retain is None or path in self.retain
        rec = _Boundary(
            path=path, leaf=leaf, w=np.asarray(w), channel_axis=channel_axis,
            x=np.asarray(self._last_x) if keep else None,
        )
        self.records.append(rec)
        # the layer passes the returned object verbatim to its conv call
        # (nn/core.py), so object identity associates call -> boundary
        self.pending[id(w)] = rec if keep else None
        return w


@contextlib.contextmanager
def _intercept_conv(hook: _CaptureHook):
    """Route jax.lax.conv_general_dilated through a recorder (eager only)."""
    orig = jax.lax.conv_general_dilated

    def wrapper(lhs, rhs, window_strides, padding, **kw):
        out = orig(lhs, rhs, window_strides, padding, **kw)
        rec = hook.pending.pop(id(rhs), None)
        if rec is not None:
            rec.cfg = {
                "window_strides": tuple(window_strides),
                "padding": padding,
                "lhs_dilation": kw.get("lhs_dilation"),
                "rhs_dilation": kw.get("rhs_dilation"),
                "dimension_numbers": kw.get("dimension_numbers"),
                "feature_group_count": kw.get("feature_group_count", 1),
            }
            if rec.x is not None:
                rec.out = np.asarray(out)
        return out

    jax.lax.conv_general_dilated = wrapper
    try:
        yield
    finally:
        jax.lax.conv_general_dilated = orig


def _cpu_default_device():
    """Pin GPTQ's JAX math to the CPU backend when another platform is the
    process default (e.g. the export CLI under the axon TPU pin): the
    patch-algebra self-check needs exact-f32 convs to agree with the
    numpy reconstruction (TPU conv precision trips it at ~4e-2), and an
    offline weight-baking pass must not silently occupy the single TPU
    tunnel.  No-op when CPU is already default or unavailable."""
    import contextlib

    try:
        dev = jax.devices("cpu")[0]
    except RuntimeError:  # pinned platform list without cpu
        return contextlib.nullcontext()
    return jax.default_device(dev)


def _cpu_put(tree):
    """Move a pytree to the CPU backend.  ``jax.default_device`` only
    steers UNCOMMITTED arrays — params loaded under a TPU default are
    committed there and would drag the capture forward back onto the
    device (measured: the self-check trips at 4e-2 on MXU convs while
    the identical grid passes on CPU).  No-op without a CPU backend."""
    try:
        dev = jax.devices("cpu")[0]
    except RuntimeError:
        return tree
    return jax.device_put(tree, dev)


def capture_boundaries(model, params, act_qp: dict, specs,
                       retain: set[str] | None = None) -> list[_Boundary]:
    """One eager offline forward under the deploy act grid; returns the
    boundary records in execution order.  ``retain`` limits which
    boundaries keep their (possibly large) input arrays."""
    hook = _CaptureHook(_cpu_put(act_qp), retain)
    with _cpu_default_device(), _intercept_conv(hook):
        ctx = Ctx()
        ctx.quant = hook
        model._forward(_cpu_put(params),
                       _cpu_put(jnp.asarray(specs, jnp.float32)), ctx)
    return hook.records


# ---------------------------------------------------------------------------
# Patch algebra: boundary -> (P, W_mat) per group, self-checked
# ---------------------------------------------------------------------------


def _conv_patches(rec: _Boundary) -> np.ndarray:
    """(N, C*kT*kF) patch rows for a conv boundary, feature order
    (c, kt, kf) — c slowest (conv_general_dilated_patches convention,
    asserted by the reconstruction check).  float32: callers subsample
    rows BEFORE widening to float64 (large-corpus memory)."""
    kT, kF = rec.w.shape[0], rec.w.shape[1]
    p = jax.lax.conv_general_dilated_patches(
        jnp.asarray(rec.x),
        filter_shape=(kT, kF),
        window_strides=rec.cfg["window_strides"],
        padding=rec.cfg["padding"],
        lhs_dilation=rec.cfg["lhs_dilation"],
        rhs_dilation=rec.cfg["rhs_dilation"],
        dimension_numbers=rec.cfg["dimension_numbers"],
    )  # NHWC out with feature dim C*kT*kF
    return np.asarray(p).reshape(-1, p.shape[-1])


def _subsample(p: np.ndarray, max_rows: int | None) -> np.ndarray:
    if max_rows is not None and p.shape[0] > max_rows:
        p = p[:: p.shape[0] // max_rows + 1]
    return np.asarray(p, np.float64)


def _boundary_groups(rec: _Boundary, max_rows: int | None = None):
    """Yield (P_g, W_g, scale_g, pin_g) per quantization group.

    P_g (N, d) float64, W_g (d, m) float64, scale_g (m,), pin_g (d, m).
    Grouping: conv feature groups (depthwise = one group per channel);
    TRA depth taps = one group per channel; matmuls = a single group.
    """
    w = np.asarray(rec.w, np.float64)
    qp = weight_qparams(jnp.asarray(rec.w), rec.channel_axis)
    scale = np.asarray(qp.scale, np.float64)
    # channel abs-max entries stay nearest-pinned.  amax must come from the
    # weight itself, NOT scale*127: the f32 scale may round UP, putting
    # scale*127 a few ulp above the true amax and un-pinning the max entry
    axes = tuple(i for i in range(w.ndim) if i != rec.channel_axis)
    amax = np.max(np.abs(w), axis=axes, keepdims=True)
    pin = np.abs(w) >= amax - 1e-12

    if rec.cfg is not None:  # conv (HWIO weight, NHWC input)
        kT, kF, cin_g, cout = rec.w.shape
        g = rec.cfg["feature_group_count"]
        outg = cout // g
        patches = _conv_patches(rec)  # features (c, kt, kf), c slowest
        out = rec.out.reshape(-1, cout) if rec.out is not None else None
        sc = scale.reshape(cout)
        for gi in range(g):
            cols = slice(gi * outg, (gi + 1) * outg)
            rows = slice(gi * cin_g * kT * kF, (gi + 1) * cin_g * kT * kF)
            # W rows must match patch feature order (ci, kt, kf)
            w_g = w[:, :, :, cols].transpose(2, 0, 1, 3).reshape(
                cin_g * kT * kF, outg)
            pin_g = pin[:, :, :, cols].transpose(2, 0, 1, 3).reshape(
                cin_g * kT * kF, outg)
            p_g = patches[:, rows]
            if out is not None:  # self-check the patch algebra exactly once
                got = p_g @ w_g
                ref = out[:, cols]
                err = np.max(np.abs(got - ref))
                tol = 1e-3 * max(1.0, float(np.max(np.abs(ref))))
                assert err <= tol, (
                    f"{rec.path}: patch algebra mismatch ({err:.3e}) -- "
                    "conv geometry or feature order wrong")
            yield _subsample(p_g, max_rows), w_g, sc[cols], pin_g
    elif rec.leaf == "depth_w":  # TRA temporal taps: y[t] = sum_i e[t+i] w[i]
        k, c = rec.w.shape
        t_out = rec.x.shape[1] - (k - 1)
        e = np.asarray(rec.x)  # (B, T+L, C), already padded
        sc = scale.reshape(c)
        for ci in range(c):
            cols = np.stack(
                [e[:, i : i + t_out, ci].reshape(-1) for i in range(k)],
                axis=1,
            )  # (N, k)
            yield (_subsample(cols, max_rows), w[:, ci : ci + 1],
                   sc[ci : ci + 1], pin[:, ci : ci + 1])
    else:  # pointwise matmul: y = x @ w, w (Cin, Cout)
        d = rec.w.shape[0]
        p = np.asarray(rec.x).reshape(-1, d)
        yield _subsample(p, max_rows), w, scale.reshape(-1), pin


def _reassemble(rec: _Boundary, parts: list[np.ndarray]) -> np.ndarray:
    """Inverse of _boundary_groups' W_g layout -> param-space weight."""
    if rec.cfg is not None:
        kT, kF, cin_g, cout = rec.w.shape
        g = rec.cfg["feature_group_count"]
        outg = cout // g
        w_new = np.empty_like(rec.w, dtype=np.float64)
        for gi, w_g in enumerate(parts):
            cols = slice(gi * outg, (gi + 1) * outg)
            w_new[:, :, :, cols] = w_g.reshape(
                cin_g, kT, kF, outg).transpose(1, 2, 0, 3)
        return w_new
    if rec.leaf == "depth_w":
        return np.concatenate(parts, axis=1)
    return parts[0]


# ---------------------------------------------------------------------------
# GPTQ core (numpy float64; W (d fan-in, m out-channels))
# ---------------------------------------------------------------------------


def gptq_rows(P: np.ndarray, W: np.ndarray, scale: np.ndarray,
              pin: np.ndarray, damp: float = 0.01,
              act_order: bool = True) -> np.ndarray:
    """Quantize W's d fan-in rows onto per-column symmetric grids,
    compensating each row's rounding error through H = PᵀP.

    ``pin`` rows-by-column entries are forced to the nearest rounding of
    the ORIGINAL value (per-channel amax invariance); q is clipped to
    ±127 so no adjusted entry can grow the channel's amax.  Returns the
    dequantized on-grid weight (d, m)."""
    d, m = W.shape
    W_orig = W
    W = W.astype(np.float64).copy()
    H = P.T @ P
    diag = np.diag(H).copy()
    dead = diag <= 0
    H[dead, dead] = 1.0
    H = H + damp * max(float(diag.mean()), 1e-12) * np.eye(d)
    order = np.argsort(-np.diag(H)) if act_order else np.arange(d)
    inv_order = np.argsort(order)
    Hp = H[order][:, order]
    # U upper-triangular with H⁻¹ = Uᵀ U (the GPTQ propagation factor)
    U = np.linalg.cholesky(np.linalg.inv(Hp)).T
    Wp = W[order]
    Wo = W_orig[order]
    pinp = pin[order]
    deadp = dead[order]
    Q = np.empty_like(Wp)
    for i in range(d):
        q = np.clip(np.round(Wp[i] / scale), INT_LO, INT_HI)
        q_orig = np.clip(np.round(Wo[i] / scale), INT_LO, INT_HI)
        # pinned (channel amax) and dead (never fires on calibration) rows
        # take the nearest rounding of the ORIGINAL value
        q = np.where(pinp[i] | deadp[i], q_orig, q)
        dq = q * scale  # the deploy (grid) value -- drives error propagation
        # store pinned entries at their ORIGINAL float value: 127*(amax/127)
        # is one f32 ulp off amax, which would drift the re-observed scale;
        # the grid value is what fake_quant/export reproduce either way
        Q[i] = np.where(pinp[i], Wo[i], dq)
        if i + 1 < d:
            err = (Wp[i] - dq) / U[i, i]
            Wp[i + 1 :] -= np.outer(U[i, i + 1 :], err)
    return Q[inv_order]


def local_error(P: np.ndarray, W: np.ndarray, W_q: np.ndarray) -> float:
    """||P (W - W_q)||_F — the objective GPTQ minimizes per layer."""
    return float(np.linalg.norm(P @ (W - W_q)))


# ---------------------------------------------------------------------------
# Hessian corpus: input-only augmentation from any wav dir
# ---------------------------------------------------------------------------


def augmented_hessian_specs(model, params, wav_dir: str, n_clips: int = 96,
                            segment_seconds: float = 4.0, fs: int = 16000,
                            seed: int = 0) -> jnp.ndarray:
    """(n_clips, F, T, 2) augmented Hessian corpus from ANY 16 kHz wav dir.

    GPTQ with Hessians from the raw 4-wav deploy calibration measured
    NEGATIVE held-out (−0.6 dB, scripts/gptq_eval.py) while the 96-clip
    augmented corpus flips it positive — the per-layer objective needs
    input DIVERSITY, exactly where the end-to-end objective could not be
    rescued by it (EVAL.md r4).

    When the wav dir's ``noisy<N>.wav`` files (symlinks followed) have
    ``enh<N>.wav`` siblings — the reference-examples layout every
    measured A/B ran on — the corpus is built by
    ``quant/qat.build_augmented_corpus`` itself with the LAST id as the
    val source, i.e. the EXACT recipe (real enh clean proxies, same RNG
    stream) behind the 26.7 dB sim (EVAL.md r4c); the r4 exporter's
    input-only proxy variant (clean proxies = the fp32 model's own
    enhancements) under-realized that sim by 0.4 dB and remains only as
    the fallback for wav dirs without enh pairs."""
    import os
    import re

    from gtcrn_micro_tpu.dsp.stft import sqrt_hann_window, stft
    from gtcrn_micro_tpu.io.wav import read_wav
    from gtcrn_micro_tpu.quant.qat import (
        _mix_at_snr,
        _pink_noise,
        build_augmented_corpus,
        enhance_fp32_batch,
    )

    seg = int(segment_seconds * fs)
    rng = np.random.default_rng(seed)

    # --- A/B-exact path: noisy/enh pairs resolvable through symlinks ---
    pair_ids: list[int] = []
    src_dirs = set()
    wav_names = sorted(f for f in os.listdir(wav_dir) if f.endswith(".wav"))
    for f in wav_names:
        m = re.fullmatch(r"noisy(\d+)\.wav", f)
        if m is None:
            pair_ids = []
            break
        real = os.path.realpath(os.path.join(wav_dir, f))
        enh = os.path.join(os.path.dirname(real), f"enh{m.group(1)}.wav")
        if not os.path.exists(enh):
            pair_ids = []
            break
        pair_ids.append(int(m.group(1)))
        src_dirs.add(os.path.dirname(real))
    if len(pair_ids) >= 2 and len(src_dirs) == 1:
        ids = sorted(pair_ids)
        train_ids = tuple(ids[:-1]) if len(ids) > 2 else tuple(ids)
        noisy_tr, _, _, _ = build_augmented_corpus(
            model, params, src_dirs.pop(),
            train_ids=train_ids, val_ids=(ids[-1],),
            n_train=n_clips, n_val=4,
            segment_seconds=segment_seconds, fs=fs, seed=seed,
        )
        window = sqrt_hann_window(model.config.win_len)
        with _cpu_default_device():
            return jnp.asarray(
                stft(jnp.asarray(noisy_tr), window), jnp.float32
            )

    # --- fallback: input-only proxy corpus from ANY wav dir ---
    noisy_src = []
    for f in wav_names:
        w, wav_fs = read_wav(os.path.join(wav_dir, f))
        if w.ndim > 1:
            w = w[:, 0]
        assert wav_fs == fs, f"expected {fs} Hz, got {wav_fs} ({f})"
        noisy_src.append(w.astype(np.float32))
    assert noisy_src, f"no wavs in {wav_dir}"
    # clean proxies: the model's own enhancement of fixed-length crops
    crop0 = np.stack([
        (np.tile(w, seg * 2 // len(w) + 1) if len(w) < seg * 2 else w)[: seg * 2]
        for w in noisy_src
    ])
    with _cpu_default_device():
        enh_src = list(enhance_fp32_batch(model, _cpu_put(params), crop0))

    def crop(w):
        if len(w) < seg:
            w = np.tile(w, seg // len(w) + 1)
        s = rng.integers(0, len(w) - seg + 1)
        return w[s : s + seg]

    clips = []
    n = len(noisy_src)
    for _ in range(n_clips):
        r = rng.random()
        k = int(rng.integers(n))
        if r < 0.25:  # raw serving-distribution crop
            clips.append(crop(noisy_src[k]))
        elif r < 0.50:  # clean proxy + stationary noise
            noise = (_pink_noise(rng, seg) if rng.random() < 0.5
                     else rng.standard_normal(seg).astype(np.float32))
            clips.append(_mix_at_snr(rng, crop(enh_src[k]), noise,
                                     -5.0, 20.0))
        elif r < 0.70:  # clean proxy + other-wav interference
            j = (k + 1 + int(rng.integers(max(n - 1, 1)))) % n
            clips.append(_mix_at_snr(rng, crop(enh_src[k]),
                                     crop(noisy_src[j]), 0.0, 15.0))
        elif r < 0.85:  # gain sweep over the serving distribution
            clips.append(crop(noisy_src[k]) * rng.uniform(0.25, 2.0))
        else:  # synthetic tone mixture (make_smoke_data recipe)
            t = np.arange(seg) / fs
            clean = sum(
                a * np.sin(2 * np.pi * f * t)
                for a, f in zip(rng.uniform(0.05, 0.2, 3),
                                rng.uniform(100, 2000, 3))
            ).astype(np.float32)
            noise = rng.standard_normal(seg).astype(np.float32)
            clips.append(_mix_at_snr(rng, clean, noise, 0.0, 10.0))
    batch = np.stack(clips).astype(np.float32)
    window = sqrt_hann_window(model.config.win_len)
    with _cpu_default_device():
        return jnp.asarray(stft(jnp.asarray(batch), window), jnp.float32)


# ---------------------------------------------------------------------------
# Driver: sequential over the execution-ordered boundaries
# ---------------------------------------------------------------------------


def _tree_mapping(records: list[_Boundary], params) -> dict[str, str]:
    """{ctx scope path: params tree path} (quant/adaround._trace_bake's
    matching: shared scope prefix + layer alias + shape, asserted unique)."""
    flat = dict(
        (jax.tree_util.keystr(p, simple=True, separator="/"), v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    )
    mapping: dict[str, str] = {}
    used: set[str] = set()
    for rec in records:
        cands = [
            k for k in flat
            if k not in used
            and flat[k].shape == rec.w.shape
            and _scope_matches(rec.path, k)
        ]
        assert len(cands) == 1, f"ambiguous target {rec.path}: {cands}"
        mapping[rec.path] = cands[0]
        used.add(cands[0])
    return mapping


def make_input_capture(model, act_qp: dict):
    """Jit-compiled {boundary path: deploy-quantized input} extractor.

    The trace-time hook collects each boundary's post-act-fake-quant input
    (the RangeObserver pattern, quant/ptq.observe_ranges); one compile
    serves every sequential recapture (weights change value, not shape)."""

    class _Collect:
        def __init__(self):
            self.xs: dict[str, jax.Array] = {}
            self._last = None

        def act(self, ctx: Ctx, leaf: str, x):
            xq = fake_quant(x, act_qp[ctx.path(leaf)])
            self._last = xq
            return xq

        def weight(self, ctx: Ctx, leaf: str, w, channel_axis: int):
            self.xs[ctx.path(leaf)] = self._last
            return w

    @jax.jit
    def run(params, specs):
        hook = _Collect()
        ctx = Ctx()
        ctx.quant = hook
        model._forward(params, specs, ctx)
        return hook.xs

    return run


def gptq_params(model, params, act_qp: dict, specs, *, damp: float = 0.01,
                act_order: bool = True, max_rows: int = 250_000,
                log=None):
    """Bake every quantized weight of ``params`` (BN-folded tree) with
    GPTQ on the deploy grid described by ``act_qp``.

    ``specs``: (N, F, T, 2) calibration batch (quant/calibration.py).
    Sequential: boundary k's inputs are captured with boundaries < k
    already baked.  Returns a new params tree; every baked weight is
    on-grid (``fake_quant`` is the identity) with its per-channel scale
    identical to the original's."""
    with _cpu_default_device():
        specs = _cpu_put(jnp.asarray(specs, jnp.float32))
        params = _cpu_put(params)
        act_qp = _cpu_put(act_qp)
    # eager probe on a small slice: conv geometry + patch-algebra
    # self-check + boundary enumeration (execution order)
    probe = capture_boundaries(model, params, act_qp,
                               specs[: min(2, specs.shape[0]), :, :33])
    for rec in probe:
        for _ in _boundary_groups(rec):  # runs the reconstruction asserts
            pass
    cfgs = {rec.path: rec.cfg for rec in probe}
    mapping = _tree_mapping(probe, params)
    capture = make_input_capture(model, act_qp)
    flat = dict(
        (jax.tree_util.keystr(p, simple=True, separator="/"), v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    )
    current = params
    for k, b in enumerate(probe):
        with _cpu_default_device():
            xs = capture(current, specs)
        rec = _Boundary(
            path=b.path, leaf=b.leaf,
            w=np.asarray(flat[mapping[b.path]]),
            channel_axis=b.channel_axis,
            x=np.asarray(jax.device_get(xs[b.path])), cfg=cfgs[b.path],
        )
        orig_w = rec.w
        with _cpu_default_device():
            qp0 = weight_qparams(jnp.asarray(orig_w), rec.channel_axis)
        parts = []
        n_pos = 0
        for P, W, sc, pin in _boundary_groups(rec, max_rows=max_rows):
            n_pos = P.shape[0]
            parts.append(gptq_rows(P, W, sc, pin, damp=damp,
                                   act_order=act_order))
        w_new = _reassemble(rec, parts)
        # clamp to the original per-channel amax: a ±127 code is one f32
        # ulp above amax when the scale rounded up, which would drift the
        # re-observed scale (the deploy value is recomputed by fake_quant
        # either way, so the clamp is quality-neutral)
        axes = tuple(i for i in range(orig_w.ndim) if i != rec.channel_axis)
        amax0 = np.max(np.abs(orig_w), axis=axes, keepdims=True)
        w_new = np.clip(w_new, -amax0, amax0).astype(orig_w.dtype)
        # idempotence: identical per-channel scale, on-grid values
        with _cpu_default_device():
            qp1 = weight_qparams(jnp.asarray(w_new), rec.channel_axis)
            assert np.allclose(np.asarray(qp0.scale), np.asarray(qp1.scale),
                               rtol=0, atol=0), f"{rec.path}: scale drifted"
            assert np.allclose(
                np.asarray(fake_quant(jnp.asarray(w_new), qp1)), w_new,
                rtol=0, atol=1e-6 * float(np.max(np.abs(w_new)) + 1e-12),
            ), f"{rec.path}: baked weight off-grid"
            flat[mapping[rec.path]] = jnp.asarray(w_new)
        current = _unflatten_like(params, flat)
        if log is not None:
            nearest = np.clip(
                np.round(orig_w / np.asarray(qp0.scale)), INT_LO, INT_HI
            ) * np.asarray(qp0.scale)
            flips = int(np.sum(w_new != nearest.astype(orig_w.dtype)))
            log(f"[{k + 1:2d}/{len(probe)}] {rec.path}: "
                f"{flips}/{orig_w.size} flips vs nearest "
                f"({n_pos} calib rows)")
    return current
