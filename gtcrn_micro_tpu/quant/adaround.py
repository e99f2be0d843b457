"""AdaRound: learned per-weight rounding for the full-int8 deployment path.

EVAL.md r2's sensitivity analysis proved int8 *weight rounding* is the
dominant error of the full-int8 artifact (int16-act ceiling 24.9 dB on hard
content; no small set of rescuable activation boundaries).  Nearest-rounding
is not the best projection of a 19k-parameter model onto the int8 grid --
AdaRound (Nagel et al., 2020, "Up or Down? Adaptive Rounding for
Post-Training Quantization") optimizes the round-up/round-down decision per
weight.  This implementation departs from the paper in one deliberate way:
instead of layer-local MSE proxies it optimizes ALL rounding variables
jointly against the end-to-end distillation objective (int8 path output ==
fp32 checkpoint output), which is exactly the metric EVAL.md reports -- the
model is small enough that the global problem fits in one optimizer.

Pieces:

- rounding variable V per quantized weight element; soft rounding
  ``h(V) = clip(sigmoid(V)*(zeta-gamma)+gamma, 0, 1)`` (rectified sigmoid),
  initialized so ``floor(w/s)+h(V) == w/s`` (zero initial rounding error)
- quantized weight sim ``w_q = s * clip(floor(w/s) + h(V), qmin, qmax)``
  with the per-channel abs-max elements PINNED to nearest rounding, so the
  baked weights reproduce the identical per-channel scale when re-observed
  by the exporters / native engine (bit-exact artifact round-trip)
- regularizer ``sum(1 - |2h-1|^beta)`` with beta annealed high->low pushes
  every h to a hard 0/1 by the end of training
- bias correction: conv/pointwise biases, TRA gate biases and BN
  gamma/beta train in float alongside V (they deploy as float/int32
  per-channel terms in every engine, so this costs the artifact nothing)

CLI (same distillation protocol as quant/qat.py: reference examples 1-4 in,
fp32 enhancements as targets, example 5 held out)::

    python -m gtcrn_micro_tpu.quant.adaround --checkpoint <ckpt.tar> \
        --steps 1500 --out_dir /tmp/adaround
"""

from __future__ import annotations

import argparse
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gtcrn_micro_tpu.nn.core import Ctx
from gtcrn_micro_tpu.quant.fake_quant import (
    QParams,
    fake_quant,
    weight_qparams,
)

ZETA, GAMMA = 1.1, -0.1  # rectified-sigmoid stretch (AdaRound defaults)


def _h(v: jax.Array) -> jax.Array:
    """Rectified sigmoid: smooth in (0,1), saturates at the corners."""
    return jnp.clip(jax.nn.sigmoid(v) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)


def _h_init(remainder: jax.Array) -> jax.Array:
    """V such that h(V) == remainder (so training starts at w_q == w)."""
    p = jnp.clip((remainder - GAMMA) / (ZETA - GAMMA), 1e-4, 1 - 1e-4)
    return jnp.log(p / (1 - p))


def _pin_mask(w: jax.Array, qp: QParams) -> jax.Array:
    """True at each channel's abs-max element(s): these stay
    nearest-rounded so amax (hence the per-channel scale) is invariant."""
    amax = jnp.abs(qp.scale) * qp.qmax  # (per-channel, broadcastable)
    return jnp.abs(w) >= amax - 1e-12


def soft_quant_weight(w, v, channel_axis: int, hard: bool = False,
                      ste: bool = False):
    """AdaRounded weight (dequantized float): s*clip(floor(w/s)+h, n, p).

    ``ste=True`` makes the floor/round straight-through so gradients also
    flow to ``w`` itself (the QAT x AdaRound hybrid: the weight may move
    across grid cells while V picks the rounding direction within one).
    The clip still blocks gradients outside the representable range."""
    qp = weight_qparams(jax.lax.stop_gradient(w), channel_axis)
    r = w / qp.scale
    base = jnp.floor(r)
    rounded = jnp.round(r)
    if ste:
        base = r + jax.lax.stop_gradient(base - r)
        rounded = r + jax.lax.stop_gradient(rounded - r)
    frac = _h(v) if not hard else (_h(v) >= 0.5).astype(w.dtype)
    pin = _pin_mask(w, qp)
    q = jnp.where(pin, rounded, base + frac)
    return jnp.clip(q, qp.qmin, qp.qmax) * qp.scale


def fake_quant_lsq(x, qp: QParams, log_s_delta):
    """Activation fake-quant with a LEARNABLE scale (LSQ-style).

    ``scale_eff = qp.scale * exp(log_s_delta)``; the round is a
    straight-through estimator, so gradients flow to both ``x`` and the
    scale (Esser et al. 2020, "Learned Step Size Quantization").  The zero
    point stays the frozen calibrated INTEGER: real 0 maps to it exactly
    for any scale, preserving the exact-zero-padding invariant and the
    GTM8/TFLite artifact contract (float scale + int zero)."""
    s = qp.scale * jnp.exp(log_s_delta)
    r = x / s
    q = r + jax.lax.stop_gradient(jnp.round(r) - r) + qp.zero
    q = jnp.clip(q, qp.qmin, qp.qmax)
    return (q - qp.zero) * s


class AdaRoundQuantizer:
    """ctx.quant hook: learned-scale activation fake-quant + AdaRounded
    weights.

    ``rvars`` maps weight path -> rounding variables (same shape as the
    weight); ``avars`` maps activation path -> scalar log-scale deltas
    (init 0 == the calibrated scale).  When missing (initial trace) they
    are registered with zero-error inits."""

    def __init__(self, act_qp: dict[str, QParams],
                 rvars: dict[str, jax.Array] | None = None,
                 avars: dict[str, jax.Array] | None = None,
                 hard: bool = False, ste: bool = False):
        self.act_qp = act_qp
        self.rvars = rvars if rvars is not None else {}
        self.avars = avars if avars is not None else {}
        self.collecting = rvars is None
        self.hard = hard
        self.ste = ste
        self.axes: dict[str, int] = {}

    def act(self, ctx: Ctx, leaf: str, x):
        path = ctx.path(leaf)
        qp = self.act_qp.get(path)
        if qp is None:
            raise KeyError(f"no activation qparams for {path}")
        if self.collecting:
            # one log-scale delta per scale entry: scalar for per-tensor
            # qparams, per-lane for per-channel grids (r4b) -- LSQ then
            # learns each lane's scale independently
            self.avars.setdefault(
                path, jnp.zeros(jnp.shape(qp.scale), jnp.float32))
            return fake_quant(x, qp)
        delta = self.avars.get(path)
        if delta is None:
            return fake_quant(x, qp)
        return fake_quant_lsq(x, qp, delta)

    def weight(self, ctx: Ctx, leaf: str, w, channel_axis: int):
        path = ctx.path(leaf)
        self.axes[path] = channel_axis
        if self.collecting:
            qp = weight_qparams(w, channel_axis)
            r = w / qp.scale
            self.rvars[path] = _h_init(r - jnp.floor(r))
            return fake_quant(w, qp)
        return soft_quant_weight(w, self.rvars[path], channel_axis,
                                 self.hard, self.ste)


def apply_avars(act_qp: dict[str, QParams],
                avars: dict[str, jax.Array]) -> dict[str, QParams]:
    """Bake learned scale deltas into a new frozen act_qp dict."""
    import dataclasses as _dc

    out = {}
    for path, qp in act_qp.items():
        d = avars.get(path)
        if d is None:
            out[path] = qp
        else:
            out[path] = _dc.replace(
                qp, scale=qp.scale * jnp.exp(jax.lax.stop_gradient(d))
            )
    return out


def init_rvars(model, params, act_qp) -> tuple[dict, dict, dict]:
    """(rvars, avars, axes): zero-error rounding vars for every quantized
    weight and zero log-scale deltas for every activation boundary."""
    q = AdaRoundQuantizer(act_qp, rvars=None)
    ctx = Ctx()
    ctx.quant = q
    spec = jnp.zeros((1, model.config.n_freqs, 2, 2), jnp.float32)
    model._forward(params, spec, ctx)
    return q.rvars, q.avars, q.axes


# Float terms co-trained with the rounding vars.  On the BN-FOLDED graph
# (the deployment flow: GTM8 export folds BN then quantizes, so AdaRound
# must optimize the folded weights' rounding) gamma must stay FROZEN --
# pack_weights re-folds BN at export, and a trained gamma would rescale the
# weights and destroy the optimized rounding grid.  beta and the conv/TRA
# biases fold into the engine's float/int32 bias terms, scale-free.
TRAINABLE_FLOAT_LEAVES = ("b", "depth_b", "point_b", "beta")


def _float_trainable(path_str: str) -> bool:
    leaf = path_str.rsplit("/", 1)[-1]
    return leaf in TRAINABLE_FLOAT_LEAVES


def adaround_optimize(
    model,
    params,
    noisy: np.ndarray,
    target: np.ndarray,
    act_qp: dict,
    steps: int = 1500,
    batch_size: int = 8,
    lr_v: float = 2e-2,
    lr_a: float = 3e-3,
    lr_f: float = 1e-4,
    lr_w: float = 0.0,
    w_anchor: float = 0.0,
    reg_weight: float = 1e-4,
    beta_hi: float = 20.0,
    beta_lo: float = 2.0,
    seed: int = 0,
    log_every: int = 100,
    val_noisy: np.ndarray | None = None,
    val_target: np.ndarray | None = None,
    eval_every: int = 250,
    patience: int = 4,
):
    """Jointly optimize weight rounding, activation scales and float
    correction terms against the end-to-end distillation objective.

    ``lr_w > 0`` additionally trains the quantized weights THEMSELVES
    through the soft quantizer with straight-through floors (the QAT x
    AdaRound hybrid): rounding can only move a weight within one grid
    cell, so when the best int8 projection needs a larger move only
    weight training can reach it.  ``w_anchor`` optionally L2-anchors the
    trained weights to the checkpoint values (guards the tiny distill
    corpus against drift).

    ``val_noisy``/``val_target`` enable early stopping (r3 verdict: the
    rounding variables overfit small corpora): every ``eval_every`` steps
    the HARD-rounded model (the deployable artifact, not the soft
    relaxation) is scored on the val split, the best-scoring variables are
    kept, and the loop stops after ``patience`` evals without improvement.
    The val split must come from source material disjoint from both the
    train clips and any reported held-out wav.

    Returns (baked_params, baked_act_qp): ``baked_params`` has every
    quantized weight replaced by its hard-rounded dequantized value
    (artifact-ready) with the trained float terms merged in;
    ``baked_qp`` carries the learned activation scales (frozen)."""
    import optax

    from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft

    rvars, avars, axes = init_rvars(model, params, act_qp)
    window = sqrt_hann_window(model.config.win_len)

    # float-correction subtree: biases + BN beta, flattened by path
    flat = dict(
        (jax.tree_util.keystr(p, simple=True, separator="/"), v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    )
    fvars = {k: v for k, v in flat.items() if _float_trainable(k)}
    train_w = lr_w > 0.0
    if train_w:
        wmap = quantized_weight_tree_paths(model, params, rvars)
        wvars = {tp: flat[tp] for tp in wmap.values()}
        w0 = {tp: jax.lax.stop_gradient(v) for tp, v in wvars.items()}
        w_size = sum(v.size for v in wvars.values())
    else:
        wvars, w0, w_size = {}, {}, 1

    def merge(fv, wv):
        out = dict(flat)
        out.update(fv)
        out.update(wv)
        return _unflatten_like(params, out)

    def forward(rv, av, fv, wv, spec):
        p = merge(fv, wv)
        ctx = Ctx()
        ctx.quant = AdaRoundQuantizer(act_qp, rvars=rv, avars=av, ste=train_w)
        return model._forward(p, spec, ctx)

    def loss_fn(opt_vars, spec, tgt_wav, beta):
        rv, av, fv, wv = opt_vars
        out = forward(rv, av, fv, wv, spec)
        wav = istft(out, window, length=tgt_wav.shape[-1])
        mse = jnp.mean(jnp.square(wav - tgt_wav))
        reg = sum(
            jnp.sum(1.0 - jnp.abs(2.0 * _h(v) - 1.0) ** beta)
            for v in rv.values()
        ) / sum(v.size for v in rv.values())
        loss = mse + reg_weight * reg
        if train_w and w_anchor > 0.0:
            loss = loss + w_anchor * sum(
                jnp.sum(jnp.square(wv[k] - w0[k])) for k in wv
            ) / w_size
        return loss, (mse, reg)

    opt = optax.multi_transform(
        {"v": optax.adam(lr_v), "a": optax.adam(lr_a), "f": optax.adam(lr_f),
         "w": optax.adam(lr_w if train_w else 0.0)},
        ({k: "v" for k in rvars}, {k: "a" for k in avars},
         {k: "f" for k in fvars}, {k: "w" for k in wvars}),
    )
    opt_state = opt.init((rvars, avars, fvars, wvars))

    @jax.jit
    def train_step(opt_vars, opt_state, spec, tgt, beta):
        (loss, (mse, reg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(opt_vars, spec, tgt, beta)
        updates, opt_state = opt.update(grads, opt_state, opt_vars)
        return optax.apply_updates(opt_vars, updates), opt_state, mse, reg

    use_val = val_noisy is not None
    if use_val:
        val_spec = stft(jnp.asarray(val_noisy), window)
        val_tgt = jnp.asarray(val_target)

        @jax.jit
        def val_snr_fn(opt_vars):
            rv, av, fv, wv = opt_vars
            ctx = Ctx()
            # score the HARD-rounded model: the thing that actually ships
            ctx.quant = AdaRoundQuantizer(
                apply_avars(act_qp, av), rvars=rv, hard=True
            )
            out = model._forward(merge(fv, wv), val_spec, ctx)
            wav = istft(out, window, length=val_tgt.shape[-1])
            err = jnp.sum(jnp.square(wav - val_tgt))
            return 10.0 * jnp.log10(
                jnp.sum(jnp.square(val_tgt)) / jnp.maximum(err, 1e-20)
            )

    rng = np.random.default_rng(seed)
    opt_vars = (rvars, avars, fvars, wvars)
    best_vars, best_snr, since_best = opt_vars, -np.inf, 0
    warm = max(steps // 5, 1)  # beta anneal starts after a free-move phase
    for i in range(steps):
        idx = rng.choice(len(noisy), size=batch_size, replace=True)
        spec = stft(jnp.asarray(noisy[idx]), window)
        frac = max(0.0, min(1.0, (i - warm) / max(steps - warm, 1)))
        beta = beta_hi + (beta_lo - beta_hi) * frac
        opt_vars, opt_state, mse, reg = train_step(
            opt_vars, opt_state, spec, jnp.asarray(target[idx]),
            jnp.float32(beta),
        )
        if log_every and (i + 1) % log_every == 0:
            print(f"  adaround {i + 1}/{steps}  mse {float(mse):.3e}  "
                  f"soft-frac {float(reg):.3f}  beta {beta:.1f}", flush=True)
        if use_val and ((i + 1) % eval_every == 0 or i + 1 == steps):
            snr = float(val_snr_fn(opt_vars))
            mark = ""
            if snr > best_snr:
                best_vars, best_snr, since_best = opt_vars, snr, 0
                mark = "  <- best"
            else:
                since_best += 1
            print(f"  adaround {i + 1}/{steps}  val SNR (hard) "
                  f"{snr:.2f} dB{mark}", flush=True)
            if since_best >= patience:
                print(f"  early stop: no val improvement in {patience} "
                      f"evals (best {best_snr:.2f} dB)", flush=True)
                break
    if use_val:
        opt_vars = best_vars

    rvars, avars, fvars, wvars = opt_vars
    # bake: hard-round every quantized weight, merge float corrections,
    # freeze the learned activation scales
    baked = _bake_params(model, merge(fvars, wvars), rvars)
    baked_qp = apply_avars(act_qp, jax.device_get(avars))
    return baked, baked_qp


def bias_refine(
    model,
    baked_params,
    noisy: np.ndarray,
    target: np.ndarray,
    act_qp: dict,
    steps: int = 400,
    batch_size: int = 8,
    lr: float = 2e-4,
    seed: int = 1,
    log_every: int = 100,
):
    """Post-bake bias correction: with the int8 weights FROZEN on their
    grid (fake-quant of a baked weight is the identity), fine-tune only the
    float deployment terms (biases + BN affine) through the standard
    fake-quant graph -- absorbs the mean error the hard rounding left."""
    import optax

    from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
    from gtcrn_micro_tpu.quant.ptq import FakeQuantizer

    window = sqrt_hann_window(model.config.win_len)
    flat = dict(
        (jax.tree_util.keystr(p, simple=True, separator="/"), v)
        for p, v in jax.tree_util.tree_leaves_with_path(baked_params)
    )
    fvars = {k: v for k, v in flat.items() if _float_trainable(k)}

    def merge(fv):
        out = dict(flat)
        out.update(fv)
        return _unflatten_like(baked_params, out)

    def loss_fn(fv, spec, tgt_wav):
        ctx = Ctx()
        ctx.quant = FakeQuantizer(act_qp)
        out = model._forward(merge(fv), spec, ctx)
        wav = istft(out, window, length=tgt_wav.shape[-1])
        return jnp.mean(jnp.square(wav - tgt_wav))

    opt = optax.adam(lr)
    opt_state = opt.init(fvars)

    @jax.jit
    def train_step(fv, opt_state, spec, tgt):
        loss, grads = jax.value_and_grad(loss_fn)(fv, spec, tgt)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(fv, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    for i in range(steps):
        idx = rng.choice(len(noisy), size=batch_size, replace=True)
        spec = stft(jnp.asarray(noisy[idx]), window)
        fvars, opt_state, loss = train_step(
            fvars, opt_state, spec, jnp.asarray(target[idx])
        )
        if log_every and (i + 1) % log_every == 0:
            print(f"  bias-refine {i + 1}/{steps}  mse {float(loss):.3e}",
                  flush=True)
    return merge(fvars)


def _unflatten_like(tree, flat: dict):
    """Rebuild ``tree``'s structure from a {path: leaf} dict."""
    paths = [
        jax.tree_util.keystr(p, simple=True, separator="/")
        for p, _ in jax.tree_util.tree_leaves_with_path(tree)
    ]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(tree), [flat[p] for p in paths]
    )


class _BakeHook:
    """ctx.quant hook that records the HARD AdaRounded value of every
    quantized weight (and passes activations through untouched)."""

    def __init__(self, rvars):
        self.rvars = rvars
        self.baked: dict[str, jax.Array] = {}

    def act(self, ctx, leaf, x):
        return x

    def weight(self, ctx, leaf, w, channel_axis):
        path = ctx.path(leaf)
        wq = soft_quant_weight(w, self.rvars[path], channel_axis, hard=True)
        self.baked[path] = wq
        return wq


def _trace_bake(model, params, rvars):
    """Run the graph once with a recording hook; return the scope->tree
    path mapping, the hard-baked values by scope path, and the flat tree.

    The ctx scope path of a weight ("encoder/en2/pw1/w") does not always
    match the params tree path ("encoder/en2/point_conv1/w"), so the
    mapping matches scope->tree by shared prefix + layer-name alias +
    shape (asserted unique)."""
    hook = _BakeHook(rvars)
    ctx = Ctx()
    ctx.quant = hook
    spec = jnp.zeros((1, model.config.n_freqs, 2, 2), jnp.float32)
    model._forward(params, spec, ctx)

    flat = dict(
        (jax.tree_util.keystr(p, simple=True, separator="/"), v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    )
    mapping: dict[str, str] = {}
    used = set()
    for spath, wq in hook.baked.items():
        cands = [
            k for k in flat
            if k not in used
            and flat[k].shape == wq.shape
            and _scope_matches(spath, k)
        ]
        assert len(cands) == 1, f"ambiguous bake target {spath}: {cands}"
        mapping[spath] = cands[0]
        used.add(cands[0])
    return mapping, hook.baked, flat


def quantized_weight_tree_paths(model, params, rvars) -> dict[str, str]:
    """{ctx scope path: params-tree path} for every quantized weight."""
    mapping, _, _ = _trace_bake(model, params, rvars)
    return mapping


def _bake_params(model, params, rvars) -> Any:
    """Replace each quantized weight leaf with its hard-rounded value."""
    mapping, baked, flat = _trace_bake(model, params, rvars)
    for spath, tpath in mapping.items():
        flat[tpath] = baked[spath]
    return _unflatten_like(params, flat)


_SCOPE_TO_TREE = {
    "pw1": ("point_conv1", "conv1", "pw1"),
    "pw2": ("point_conv2",),
    "pw3": ("conv3",),
    "conv": ("conv",),
    "depth_conv": ("depth_conv", "conv2"),
    "tra": ("tra",),
}


def _scope_matches(scope_path: str, tree_path: str) -> bool:
    """True iff a ctx scope path and a params tree path name the same layer.

    Both end in the same weight leaf; the scope's layer name maps to one of
    a few tree aliases (Pointwise 'pw1' is stored under 'point_conv1' in
    GTConvBlock but 'conv1' in TCN, etc.); all enclosing block scopes match
    the tree path verbatim."""
    s_parts = scope_path.split("/")
    t_parts = tree_path.split("/")
    if s_parts[-1] != t_parts[-1]:
        return False
    s_layer, t_layer = s_parts[-2], t_parts[-2]
    if t_layer not in _SCOPE_TO_TREE.get(s_layer, (s_layer,)):
        return False
    return s_parts[:-2] == t_parts[:-2]


def main(args=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument(
        "--wav_dir",
        default="/root/reference/gtcrn_micro/examples/gtcrn_micro",
    )
    parser.add_argument("--train_wavs", default="noisy1,noisy2,noisy3,noisy4")
    parser.add_argument("--held_out", default="noisy5")
    parser.add_argument("--corpus_mode", default="augmented",
                        choices=("augmented", "examples"),
                        help="augmented (default): n_train augmented clips "
                             "from source wavs 1-3 + a val split from wav 4 "
                             "for early stopping (r4; the held-out wav "
                             "stays out of ALL selection); examples: the "
                             "r3 56-segment crops of --train_wavs, no val")
    parser.add_argument("--n_train", type=int, default=384)
    parser.add_argument("--n_val", type=int, default=48)
    parser.add_argument("--steps", type=int, default=2500)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--lr_v", type=float, default=2e-2)
    parser.add_argument("--lr_f", type=float, default=1e-4)
    parser.add_argument("--lr_w", type=float, default=0.0,
                        help="also train the quantized weights through the "
                             "soft quantizer (straight-through); 0 = off")
    parser.add_argument("--w_anchor", type=float, default=0.0,
                        help="L2 anchor of trained weights to the ckpt")
    parser.add_argument("--reg_weight", type=float, default=2e-3)
    parser.add_argument("--post_bias_steps", type=int, default=400)
    parser.add_argument("--act_bits", type=int, default=8, choices=(8, 16))
    parser.add_argument("--per_channel_acts", action="store_true",
                        help="minor-axis activation scales (r4b: moves the "
                             "a8 held-out wall ~17 -> ~21 dB and lifts 16x8 "
                             "to 29.7 dB untrained; EVAL.md). LSQ learns "
                             "per-lane deltas. Requires --calib deploy")
    parser.add_argument("--calib", default="deploy",
                        choices=("deploy", "corpus"))
    parser.add_argument("--out_dir", default="/tmp/gtcrn_adaround")
    ns = parser.parse_args(args)
    if ns.per_channel_acts and ns.calib != "deploy":
        parser.error("--per_channel_acts requires --calib deploy")

    from gtcrn_micro_tpu.eval.infer import load_params
    from gtcrn_micro_tpu.io.wav import read_wav
    from gtcrn_micro_tpu.models.folding import fold_bn_params
    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
    from gtcrn_micro_tpu.quant.qat import (
        build_augmented_corpus,
        build_distill_corpus,
        calibrate_act_qparams,
        enhance_fp32,
        quant_wav_snr,
    )

    model = GTCRNMicro()
    # Fold BN FIRST: the deployment chain (GTM8 export, native engines,
    # int8 XLA step) quantizes the folded weights, so the rounding must be
    # optimized on the folded graph to carry over bit-exactly.
    params = fold_bn_params(load_params(ns.checkpoint))
    train_paths = [
        os.path.join(ns.wav_dir, f"{n}.wav") for n in ns.train_wavs.split(",")
    ]

    print("building distillation corpus (fp32 targets) ...", flush=True)
    if ns.corpus_mode == "augmented":
        # train sources: wavs 1-3; val sources: wav 4 (early stopping);
        # the reporting wav (--held_out, default noisy5) is in NEITHER
        noisy, target, val_noisy, val_target = build_augmented_corpus(
            model, params, ns.wav_dir, train_ids=(1, 2, 3), val_ids=(4,),
            n_train=ns.n_train, n_val=ns.n_val,
        )
        print(f"  {len(noisy)} train + {len(val_noisy)} val augmented "
              f"clips of {noisy.shape[1] / 16000:.0f} s", flush=True)
    else:
        noisy, target = build_distill_corpus(
            model, params, train_paths, stride_seconds=2.0
        )
        val_noisy = val_target = None
        print(f"  {len(noisy)} segments of {noisy.shape[1] / 16000:.0f} s",
              flush=True)
    if ns.calib == "corpus":
        act_qp = calibrate_act_qparams(model, params, noisy, ns.act_bits)
    else:
        # deployment calibration: full-length wavs through the reference's
        # 973-frame protocol (quant/calibration.py) -- the same ranges the
        # eval/infer --quant path and the GTM8 export flow use, and
        # measurably better than 4 s-segment calibration (EVAL.md r2:
        # 28.3 vs 23.7 dB PTQ on noisy1)
        import tempfile

        from gtcrn_micro_tpu.quant.calibration import calibration_specs
        from gtcrn_micro_tpu.quant.fake_quant import act_qparams
        from gtcrn_micro_tpu.quant.ptq import observe_ranges

        # calibrate on NOISY wavs only (the model's serving inputs, like
        # the reference's 300 blind-set noisy wavs)
        calib_dir = tempfile.mkdtemp(prefix="gtcrn_calib_")
        for f in sorted(os.listdir(ns.wav_dir)):
            if f.startswith("noisy") and f.endswith(".wav"):
                os.symlink(os.path.join(ns.wav_dir, f),
                           os.path.join(calib_dir, f))
        calib = jnp.asarray(calibration_specs(calib_dir, n_wavs=32))
        ranges = observe_ranges(model, params, calib, batch_size=4,
                                per_channel=ns.per_channel_acts)
        act_qp = {
            p: act_qparams(jnp.asarray(lo, jnp.float32),
                           jnp.asarray(hi, jnp.float32), ns.act_bits)
            for p, (lo, hi) in ranges.items()
        }

    held_wav, _ = read_wav(os.path.join(ns.wav_dir, f"{ns.held_out}.wav"))
    if held_wav.ndim > 1:
        held_wav = held_wav[:, 0]
    held_target = enhance_fp32(model, params, held_wav)
    seen_wav, _ = read_wav(train_paths[0])
    if seen_wav.ndim > 1:
        seen_wav = seen_wav[:, 0]
    seen_target = enhance_fp32(model, params, seen_wav)

    before_h = quant_wav_snr(model, params, act_qp, held_wav, held_target)
    before_s = quant_wav_snr(model, params, act_qp, seen_wav, seen_target)
    print(f"PTQ int{ns.act_bits} SNR vs fp32: train-wav {before_s:.1f} dB, "
          f"held-out {before_h:.1f} dB", flush=True)

    baked, baked_qp = adaround_optimize(
        model, params, noisy, target, act_qp,
        steps=ns.steps, batch_size=ns.batch_size,
        lr_v=ns.lr_v, lr_f=ns.lr_f, lr_w=ns.lr_w, w_anchor=ns.w_anchor,
        reg_weight=ns.reg_weight,
        val_noisy=val_noisy, val_target=val_target,
    )

    after_h = quant_wav_snr(model, baked, baked_qp, held_wav, held_target)
    after_s = quant_wav_snr(model, baked, baked_qp, seen_wav, seen_target)
    print(f"AdaRound+LSQ int{ns.act_bits} SNR vs fp32: "
          f"train-wav {after_s:.1f} dB, held-out {after_h:.1f} dB",
          flush=True)

    def corpus_snr(p) -> float:
        """Batched hard-quantized SNR on the proxy val split (selection
        metric -- the reported held-out wav takes part in NO decision)."""
        from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
        from gtcrn_micro_tpu.quant.ptq import QuantizedModel

        window = sqrt_hann_window(model.config.win_len)
        spec = stft(jnp.asarray(val_noisy), window)
        qmodel = QuantizedModel(model=model, act_qp=baked_qp)
        enh = jax.jit(qmodel.apply)(p, spec)
        out = np.asarray(istft(enh, window, length=val_noisy.shape[1]))
        err = float(np.sum((out - val_target) ** 2))
        return 10.0 * np.log10(
            float(np.sum(val_target**2)) / max(err, 1e-20)
        )

    if ns.post_bias_steps:
        refined = bias_refine(
            model, baked, noisy, target, baked_qp, steps=ns.post_bias_steps,
        )
        ref_h = quant_wav_snr(model, refined, baked_qp, held_wav, held_target)
        ref_s = quant_wav_snr(model, refined, baked_qp, seen_wav, seen_target)
        print(f"+bias-refine int{ns.act_bits} SNR vs fp32: "
              f"train-wav {ref_s:.1f} dB, held-out {ref_h:.1f} dB",
              flush=True)
        if val_noisy is not None:
            # select on the PROXY split (r4: selecting on the reported
            # held-out wav was leakage; it is now report-only)
            keep = corpus_snr(refined) > corpus_snr(baked)
        else:
            keep = ref_h > after_h  # legacy examples mode (r3 behavior)
        if keep:
            baked = refined
        else:
            print("  bias-refine regressed the selection split; keeping "
                  "the pre-refine bake", flush=True)

    os.makedirs(ns.out_dir, exist_ok=True)
    from gtcrn_micro_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(os.path.join(ns.out_dir, "checkpoints"))
    mgr.save(ns.steps, {"params": jax.device_get(baked)})
    mgr.close()
    np.savez(
        os.path.join(ns.out_dir, "act_qp.npz"),
        **{
            f"{p}:scale": np.asarray(qp.scale) for p, qp in baked_qp.items()
        },
        **{f"{p}:zero": np.asarray(qp.zero) for p, qp in baked_qp.items()},
        **{
            f"{p}:qminmax": np.asarray([qp.qmin, qp.qmax])
            for p, qp in baked_qp.items()
        },
    )
    print(f"AdaRounded params + learned act scales saved to {ns.out_dir}",
          flush=True)


def load_act_qp(path: str) -> dict:
    """Load an act_qp dict saved by the AdaRound CLI (act_qp.npz)."""
    data = np.load(path)
    paths = sorted({k.rsplit(":", 1)[0] for k in data.files})
    return {
        p: QParams(
            scale=jnp.asarray(data[f"{p}:scale"], jnp.float32),
            zero=jnp.asarray(data[f"{p}:zero"]),
            qmin=int(data[f"{p}:qminmax"][0]),
            qmax=int(data[f"{p}:qminmax"][1]),
        )
        for p in paths
    }


if __name__ == "__main__":
    main()
