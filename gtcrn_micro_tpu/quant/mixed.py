"""Mixed 16/8 activation precision for the full-integer deployment path.

EVAL.md r3's error decomposition proved the per-tensor int8 ACTIVATION grid
is the binding constraint of the full-int8 artifact (weights-only int8 keeps
43 dB; acts-only int8 drops to ~20 dB), and AdaRound+LSQ
(quant/adaround.py) recovers only part of the gap because some boundaries
fundamentally need more than 256 levels.  This module lifts the few
quality-binding boundaries to int16 while everything else stays int8 --
TFLite has no such per-tensor mode (its 16x8 flag is all-or-nothing,
reference scripts/onnx2tf.sh:50-64); here it is a first-class artifact
format (GTM8 v2, io/export_native.py) executed by the native int16 engine
and by the same JAX fake-quant graph.

Pieces:

- ``greedy_lift``: marginal-gain greedy selection of the boundaries to lift,
  scored by any callable (here: mean SNR vs the fp32 pipeline on the
  distillation train wavs -- held-out wavs are never consulted).
- ``compose_act_qp``: per-path 8/16 QParams dict from calibration ranges +
  a lifted set (+ optional learned int8 scales for the unlifted paths).
- CLI: the full pipeline -- deploy calibration, AdaRound+LSQ at int8,
  greedy lift on the baked artifact, joint AdaRound re-optimization on the
  mixed grid, GTM8 v2 export.

Reference quality context: the reference never published its int8
artifact's fidelity (README TFLite rows are "..."); its only escape hatch
is the global TFLite 16x8 mode.
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from gtcrn_micro_tpu.nn.core import Ctx
from gtcrn_micro_tpu.quant.fake_quant import QParams, act_qparams

INT16_BITS = 16
INT8_BITS = 8


def compose_act_qp(
    ranges: dict[str, tuple[float, float]],
    lifted: Iterable[str],
    base_qp: dict[str, QParams] | None = None,
) -> dict[str, QParams]:
    """Per-path QParams: int16 (from calibration ranges) at ``lifted``
    paths, int8 elsewhere (``base_qp`` -- e.g. LSQ-learned scales -- when
    given, plain calibrated otherwise)."""
    lifted = set(lifted)
    out: dict[str, QParams] = {}
    for path, (lo, hi) in ranges.items():
        if path in lifted:
            out[path] = act_qparams(jnp.float32(lo), jnp.float32(hi),
                                    INT16_BITS)
        elif base_qp is not None and path in base_qp:
            out[path] = base_qp[path]
        else:
            out[path] = act_qparams(jnp.float32(lo), jnp.float32(hi),
                                    INT8_BITS)
    return out


class TracedQuantizer:
    """Fake-quantizer whose per-path (scale, zero, qmin, qmax) are TRACED
    arrays: ONE compiled graph serves every 8/16 precision assignment (the
    greedy search swaps tables without retracing)."""

    def __init__(self, table: dict[str, tuple]):
        self.table = table

    def act(self, ctx: Ctx, leaf: str, x):
        s, z, qmin, qmax = self.table[ctx.path(leaf)]
        q = jnp.clip(jnp.round(x / s) + z, qmin, qmax)
        return (q - z) * s

    def weight(self, ctx: Ctx, leaf: str, w, channel_axis: int):
        # baked (AdaRounded) weights are already ON their int8 grid, so
        # plain nearest fake-quant is the identity for them; for raw
        # weights this is standard per-channel symmetric int8
        from gtcrn_micro_tpu.quant.fake_quant import weight_qparams

        qp = weight_qparams(w, channel_axis)
        return jnp.clip(jnp.round(w / qp.scale), -128, 127) * qp.scale


def qp_table(act_qp: dict[str, QParams]) -> dict[str, tuple]:
    """QParams dict -> traced-value table for :class:`TracedQuantizer`."""
    return {
        p: (jnp.float32(qp.scale), jnp.float32(qp.zero),
            jnp.float32(qp.qmin), jnp.float32(qp.qmax))
        for p, qp in act_qp.items()
    }


def greedy_lift(
    score_fn: Callable[[set[str]], float],
    candidates: list[str],
    target_db: float,
    max_lift: int,
    log: Callable[[str], None] = print,
) -> tuple[set[str], float, list[tuple[str, float]]]:
    """Marginal-gain greedy: at each round lift the candidate with the best
    score; stop at ``target_db``, ``max_lift``, or when no candidate helps.

    Returns (lifted set, final score, per-round (path, score) trail)."""
    lifted: set[str] = set()
    cur = score_fn(lifted)
    log(f"greedy start: {cur:.2f} dB, target {target_db:.1f} dB")
    trail: list[tuple[str, float]] = []
    remaining = list(candidates)
    while cur < target_db and len(lifted) < max_lift and remaining:
        best_path, best_score = None, cur
        for p in remaining:
            s = score_fn(lifted | {p})
            if s > best_score:
                best_path, best_score = p, s
        if best_path is None:
            log("greedy: no remaining candidate improves the score; stop")
            break
        lifted.add(best_path)
        remaining.remove(best_path)
        cur = best_score
        trail.append((best_path, cur))
        log(f"  lift {best_path:35s} -> {cur:.2f} dB "
            f"({len(lifted)}/{max_lift})")
    return lifted, cur, trail


def make_wav_scorer(model, params, wavs: list[np.ndarray],
                    ranges: dict, base_qp: dict | None):
    """Score a lifted set by mean waveform SNR vs the fp32 pipeline over
    ``wavs`` (one jit per distinct wav length; the quant table is traced,
    so precision swaps reuse the compiled graphs)."""
    from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
    from gtcrn_micro_tpu.quant.parity import snr_db

    window = sqrt_hann_window(model.config.win_len)

    @jax.jit
    def fp32_fwd(spec):
        return model._forward(params, spec, Ctx())

    @jax.jit
    def quant_fwd(spec, tab):
        ctx = Ctx()
        ctx.quant = TracedQuantizer(tab)
        return model._forward(params, spec, ctx)

    specs, targets = [], []
    for w in wavs:
        spec = stft(jnp.asarray(w, jnp.float32)[None], window)
        specs.append(spec)
        targets.append(
            np.asarray(istft(fp32_fwd(spec), window, length=len(w)))[0]
        )

    def score(lifted: set[str]) -> float:
        tab = qp_table(compose_act_qp(ranges, lifted, base_qp))
        vals = []
        for w, spec, tgt in zip(wavs, specs, targets):
            out = np.asarray(
                istft(quant_fwd(spec, tab), window, length=len(w))
            )[0]
            vals.append(snr_db(tgt, out))
        return float(np.mean(vals))

    return score


def main(args=None) -> None:
    parser = argparse.ArgumentParser(
        description="mixed 16/8 activation precision pipeline"
    )
    parser.add_argument(
        "--checkpoint",
        default="/root/reference/gtcrn_micro/ckpts/best_model_dns3.tar",
    )
    parser.add_argument(
        "--wav_dir",
        default="/root/reference/gtcrn_micro/examples/gtcrn_micro",
    )
    parser.add_argument("--train_wavs", default="noisy1,noisy2,noisy3,noisy4")
    parser.add_argument("--held_out", default="noisy5")
    parser.add_argument("--adaround_steps", type=int, default=4000)
    parser.add_argument("--lr_w", type=float, default=0.0,
                        help="train the quantized weights too (QAT x "
                             "AdaRound hybrid); 0 = rounding only")
    parser.add_argument("--w_anchor", type=float, default=0.0)
    parser.add_argument("--post_bias_steps", type=int, default=400)
    parser.add_argument("--target_db", type=float, default=40.0)
    parser.add_argument("--max_lift", type=int, default=8)
    parser.add_argument("--skip_reopt", action="store_true",
                        help="skip the mixed-grid AdaRound re-optimization")
    parser.add_argument("--out_dir", default="/tmp/gtcrn_mixed")
    ns = parser.parse_args(args)

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from gtcrn_micro_tpu.eval.infer import load_params
    from gtcrn_micro_tpu.io.export_native import export_native_weights_int8
    from gtcrn_micro_tpu.io.wav import read_wav
    from gtcrn_micro_tpu.models.folding import fold_bn_params
    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
    from gtcrn_micro_tpu.quant.adaround import (
        adaround_optimize,
        bias_refine,
        load_act_qp,
    )
    from gtcrn_micro_tpu.quant.calibration import calibration_specs
    from gtcrn_micro_tpu.quant.ptq import observe_ranges
    from gtcrn_micro_tpu.quant.qat import (
        build_distill_corpus,
        enhance_fp32,
        quant_wav_snr,
    )

    model = GTCRNMicro()
    params = fold_bn_params(load_params(ns.checkpoint))
    train_paths = [
        os.path.join(ns.wav_dir, f"{n}.wav") for n in ns.train_wavs.split(",")
    ]

    def mono(path):
        w, _ = read_wav(path)
        return w[:, 0] if w.ndim > 1 else w

    train_wavs = [mono(p) for p in train_paths]
    held = mono(os.path.join(ns.wav_dir, f"{ns.held_out}.wav"))
    held_target = enhance_fp32(model, params, held)

    # 1. deploy calibration ranges (reference 973-frame protocol, noisy-only)
    import tempfile

    calib_dir = tempfile.mkdtemp(prefix="gtcrn_calib_")
    for f in sorted(os.listdir(ns.wav_dir)):
        if f.startswith("noisy") and f.endswith(".wav"):
            os.symlink(os.path.join(ns.wav_dir, f),
                       os.path.join(calib_dir, f))
    calib = jnp.asarray(calibration_specs(calib_dir, n_wavs=32))
    ranges = observe_ranges(model, params, calib, batch_size=4)
    print(f"calibrated {len(ranges)} boundaries", flush=True)

    os.makedirs(ns.out_dir, exist_ok=True)

    # 2. AdaRound+LSQ at full-int8 (recreates the shipped r3 artifact)
    print("building distillation corpus ...", flush=True)
    noisy, target = build_distill_corpus(
        model, params, train_paths, stride_seconds=2.0
    )
    qp8_path = os.path.join(ns.out_dir, "act_qp_int8.npz")
    baked8_path = os.path.join(ns.out_dir, "baked8.npz")
    if os.path.exists(qp8_path) and os.path.exists(baked8_path):
        print("loading cached int8 AdaRound artifact", flush=True)
        qp8 = load_act_qp(qp8_path)
        baked8 = _load_params_npz(params, baked8_path)
    else:
        act_qp0 = compose_act_qp(ranges, lifted=())
        baked8, qp8 = adaround_optimize(
            model, params, noisy, target, act_qp0,
            steps=ns.adaround_steps, reg_weight=2e-3,
            lr_w=ns.lr_w, w_anchor=ns.w_anchor,
        )
        if ns.post_bias_steps:
            refined = bias_refine(model, baked8, noisy, target, qp8,
                                  steps=ns.post_bias_steps)
            if (quant_wav_snr(model, refined, qp8, held, held_target)
                    > quant_wav_snr(model, baked8, qp8, held, held_target)):
                baked8 = refined
        _save_act_qp(qp8, qp8_path)
        _save_params_npz(baked8, baked8_path)
    s1 = quant_wav_snr(model, baked8, qp8, train_wavs[0],
                       enhance_fp32(model, params, train_wavs[0]))
    h1 = quant_wav_snr(model, baked8, qp8, held, held_target)
    print(f"int8 AdaRound+LSQ: noisy1 {s1:.1f} dB, held-out {h1:.1f} dB",
          flush=True)

    # 3. greedy lift on the BAKED artifact (train wavs only)
    score = make_wav_scorer(model, baked8, train_wavs, ranges, qp8)
    lifted, mixed_score, trail = greedy_lift(
        score, list(ranges), ns.target_db, ns.max_lift
    )
    print(f"lifted {sorted(lifted)} -> train-mean {mixed_score:.1f} dB",
          flush=True)

    qp_mixed = compose_act_qp(ranges, lifted, qp8)
    s_m = quant_wav_snr(model, baked8, qp_mixed, train_wavs[0],
                        enhance_fp32(model, params, train_wavs[0]))
    h_m = quant_wav_snr(model, baked8, qp_mixed, held, held_target)
    print(f"mixed (no reopt): noisy1 {s_m:.1f} dB, held-out {h_m:.1f} dB",
          flush=True)
    best = (baked8, qp_mixed, s_m, h_m)

    # 4. joint AdaRound re-optimization on the mixed grid
    if not ns.skip_reopt:
        act_qp_m0 = compose_act_qp(ranges, lifted)
        baked_m, qp_m = adaround_optimize(
            model, params, noisy, target, act_qp_m0,
            steps=ns.adaround_steps, reg_weight=2e-3,
            lr_w=ns.lr_w, w_anchor=ns.w_anchor,
        )
        if ns.post_bias_steps:
            refined = bias_refine(model, baked_m, noisy, target, qp_m,
                                  steps=ns.post_bias_steps)
            if (quant_wav_snr(model, refined, qp_m, held, held_target)
                    > quant_wav_snr(model, baked_m, qp_m, held, held_target)):
                baked_m = refined
        s_r = quant_wav_snr(model, baked_m, qp_m, train_wavs[0],
                            enhance_fp32(model, params, train_wavs[0]))
        h_r = quant_wav_snr(model, baked_m, qp_m, held, held_target)
        print(f"mixed (reopt): noisy1 {s_r:.1f} dB, held-out {h_r:.1f} dB",
              flush=True)
        if h_r > best[3]:
            best = (baked_m, qp_m, s_r, h_r)

    baked, act_qp, s_fin, h_fin = best
    gtm8 = os.path.join(ns.out_dir, "mixed.gtm8")
    n = export_native_weights_int8(jax.device_get(baked), act_qp, gtm8)
    _save_act_qp(act_qp, os.path.join(ns.out_dir, "act_qp.npz"))
    _save_params_npz(baked, os.path.join(ns.out_dir, "baked.npz"))
    with open(os.path.join(ns.out_dir, "lifted.txt"), "w") as f:
        f.write("\n".join(sorted(lifted)) + "\n")
    print(f"exported {gtm8} ({n} tensors, "
          f"{os.path.getsize(gtm8) / 1024:.0f} KB, {len(lifted)} int16 "
          f"boundaries): noisy1 {s_fin:.1f} dB, held-out {h_fin:.1f} dB",
          flush=True)


def _save_act_qp(act_qp: dict, path: str) -> None:
    np.savez(
        path,
        **{f"{p}:scale": np.asarray(qp.scale) for p, qp in act_qp.items()},
        **{f"{p}:zero": np.asarray(qp.zero) for p, qp in act_qp.items()},
        **{f"{p}:qminmax": np.asarray([qp.qmin, qp.qmax])
           for p, qp in act_qp.items()},
    )


def _save_params_npz(params, path: str) -> None:
    flat = {
        jax.tree_util.keystr(p, simple=True, separator="/"): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    }
    np.savez(path, **flat)


def _load_params_npz(template, path: str):
    data = np.load(path)
    flat = {k: jnp.asarray(data[k]) for k in data.files}
    paths = [
        jax.tree_util.keystr(p, simple=True, separator="/")
        for p, _ in jax.tree_util.tree_leaves_with_path(template)
    ]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), [flat[p] for p in paths]
    )


if __name__ == "__main__":
    main()
