"""Portable graph export via jax.export (StableHLO).

The reference serializes its graph through torch.onnx (opset 16, static
shapes; streaming/conversion/stream_onnx.py:15-129) and onward to TFLite.
The TPU-native equivalent is StableHLO through ``jax.export``: a
self-contained, versioned artifact XLA can reload and compile on any
backend -- plus the native-runtime weights binary (io/export_native.py) for
the C++ deployment path.

Exports:
- offline:   enhanced = f(params, spec (B, 257, T, 2))
- streaming: (enhanced, state') = f(params, state, spec (B, 257, 1, 2))

CLI: ``python -m gtcrn_micro_tpu.io.export_stablehlo --checkpoint <ckpt>
--out_dir <dir> [--batch 1 --frames 63]``
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro


def export_offline(model: GTCRNMicro, params, batch: int, frames: int) -> bytes:
    """Serialized StableHLO for the offline forward (static shapes, like the
    reference's onnx export)."""
    from jax import export as jexport

    fn = lambda p, s: model.apply(p, s)  # noqa: E731
    spec = jax.ShapeDtypeStruct(
        (batch, model.config.n_freqs, frames, 2), jnp.float32
    )
    params_shape = jax.tree.map(
        lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype), params
    )
    exported = jexport.export(jax.jit(fn))(params_shape, spec)
    return exported.serialize()


def export_streaming(model: GTCRNMicro, params, batch: int) -> bytes:
    """Serialized StableHLO for one streaming step (ring state threaded)."""
    from jax import export as jexport

    state = model.init_state(batch)
    spec = jax.ShapeDtypeStruct(
        (batch, model.config.n_freqs, 1, 2), jnp.float32
    )
    params_shape = jax.tree.map(
        lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype), params
    )
    state_shape = jax.tree.map(
        lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype), state
    )
    exported = jexport.export(jax.jit(model.step))(
        params_shape, state_shape, spec
    )
    return exported.serialize()


def export_audio(
    model: GTCRNMicro, params, batch: int, chunk_hops: int = 1,
    dft: str = "mxu",
) -> bytes:
    """Serialized StableHLO for the SERVED program: one audio-in ->
    audio-out step (online STFT -> streaming model step -> online iSTFT,
    ``dsp/stream_dsp.make_audio_step`` — the program bench.py measures).

    The reference's deployable streaming artifact wraps only the model and
    leaves the DSP to the host (stream_onnx.py:15-129); this exports the
    WHOLE served step, DSP state included, so a loader replays exactly what
    serving runs.  Signature (flat, portable):

        (params, dsp.in_buf (B,256), dsp.ola_buf (B,256), model_state dict,
         chunk (B, 256*T)) -> (out_chunk, in_buf', ola_buf', model_state')

    Output runs one hop behind input; the first emitted chunk is the
    center-trim region (dsp/stream_dsp.py online-DSP contract).  ``dft``:
    "mxu" exports the served MXU-DFT form (two dots); "fft" the
    FFT-bit-exact form.
    """
    from jax import export as jexport

    from gtcrn_micro_tpu.dsp import stream_dsp
    from gtcrn_micro_tpu.dsp.stft import sqrt_hann_window

    window = sqrt_hann_window(model.config.win_len)
    step = stream_dsp.make_audio_step(model, window, dft=dft)

    def flat_step(p, in_buf, ola_buf, mstate, chunk):
        out, dsp, ms = step(
            p, stream_dsp.DspState(in_buf, ola_buf), mstate, chunk
        )
        return out, dsp.in_buf, dsp.ola_buf, ms

    dsp0 = stream_dsp.init_dsp_state(batch)
    mstate0 = model.init_state(batch)
    shapes = jax.tree.map(
        lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype),
        (params, dsp0.in_buf, dsp0.ola_buf, mstate0),
    )
    chunk = jax.ShapeDtypeStruct((batch, 256 * chunk_hops), jnp.float32)
    exported = jexport.export(jax.jit(flat_step))(*shapes, chunk)
    return exported.serialize()


def load_exported(path: str):
    """Deserialize an exported artifact; ``.call(*args)`` runs it."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


def main(args=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out_dir", default="export")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--frames", type=int, default=63)
    parser.add_argument("--audio_hops", type=int, default=1,
                        help="T (hops per chunk) for the audio-level "
                             "serving-step artifacts (power of two <= 16)")
    parser.add_argument(
        "--format", choices=["all", "stablehlo", "onnx", "native",
                             "native-int8"],
        default="all",
        help="stablehlo: jax.export artifacts; onnx: opset-16 offline + "
        "streaming-step graphs (io/onnx_export.py); native: C++ runtime "
        "weights binary (GTM1 fp32); native-int8: GTM8 quantized artifact "
        "(requires --calib_dir; --act_bits / --per_channel_acts select the "
        "mode -- per-channel emits the v3 layout for the native PC engine)",
    )
    parser.add_argument("--calib_dir", default=None,
                        help="noisy-wav dir for GTM8 activation calibration")
    parser.add_argument("--act_bits", type=int, default=16, choices=(8, 16))
    parser.add_argument("--per_channel_acts", action="store_true")
    parser.add_argument("--integer_pc", action="store_true",
                        help="with --per_channel_acts: GTM8 v4 -- quantize "
                             "each weight on its act-scale-folded tensor so "
                             "the per-channel grid runs full-INTEGER MACs "
                             "(native EngineV4; quant.ptq v4=True sim)")
    parser.add_argument("--gptq", action="store_true",
                        help="GPTQ weight rounding on the deploy grid with "
                             "an augmented Hessian corpus from --calib_dir "
                             "(quant/gptq.py; +0.5 dB held-out over nearest "
                             "on a16-pc -- EVAL.md r4b). Default: nearest.")
    parser.add_argument("--gptq_clips", type=int, default=96,
                        help="augmented Hessian corpus size for --gptq")
    ns = parser.parse_args(args)

    from gtcrn_micro_tpu.eval.infer import load_params

    model = GTCRNMicro()
    params = load_params(ns.checkpoint)
    os.makedirs(ns.out_dir, exist_ok=True)
    produced = []

    if ns.format in ("all", "stablehlo"):
        off = export_offline(model, params, ns.batch, ns.frames)
        with open(os.path.join(ns.out_dir, "gtcrn_micro_offline.stablehlo"), "wb") as f:
            f.write(off)
        stream = export_streaming(model, params, ns.batch)
        with open(os.path.join(ns.out_dir, "gtcrn_micro_stream.stablehlo"), "wb") as f:
            f.write(stream)
        audio = export_audio(model, params, ns.batch, ns.audio_hops)
        with open(os.path.join(ns.out_dir, "gtcrn_micro_audio.stablehlo"), "wb") as f:
            f.write(audio)
        produced.append(
            f"stablehlo offline ({len(off)} B) + stream ({len(stream)} B) "
            f"+ audio step ({len(audio)} B)"
        )

    if ns.format in ("all", "onnx"):
        from gtcrn_micro_tpu.io.onnx_export import (
            export_audio_onnx,
            export_model_onnx,
            export_stream_onnx,
        )

        off = export_model_onnx(model, params, ns.batch, ns.frames)
        with open(os.path.join(ns.out_dir, "gtcrn_micro.onnx"), "wb") as f:
            f.write(off)
        stream = export_stream_onnx(model, params, ns.batch)
        with open(os.path.join(ns.out_dir, "gtcrn_micro_stream.onnx"), "wb") as f:
            f.write(stream)
        audio = export_audio_onnx(model, params, ns.batch, ns.audio_hops)
        with open(os.path.join(ns.out_dir, "gtcrn_micro_audio.onnx"), "wb") as f:
            f.write(audio)
        produced.append(
            f"onnx offline ({len(off)} B) + stream ({len(stream)} B) "
            f"+ audio step ({len(audio)} B)"
        )

    if ns.format in ("all", "native"):
        from gtcrn_micro_tpu.io.export_native import export_native_weights

        n = export_native_weights(
            params, os.path.join(ns.out_dir, "gtcrn_micro_weights.bin")
        )
        produced.append(f"native weights ({n} tensors)")

    if ns.format == "native-int8":
        # GTM8: BN-folded weights quantized per out-channel + calibrated
        # activation qparams (per-tensor = v1; per-channel = v3, consumed
        # by the native PC engine -- EVAL.md r4b)
        if not ns.calib_dir:
            parser.error("--format native-int8 requires --calib_dir")
        import jax.numpy as jnp

        from gtcrn_micro_tpu.io.export_native import (
            export_native_weights_int8,
        )
        from gtcrn_micro_tpu.models.folding import fold_bn_params
        from gtcrn_micro_tpu.quant.calibration import calibration_specs
        from gtcrn_micro_tpu.quant.fake_quant import act_qparams
        from gtcrn_micro_tpu.quant.ptq import observe_ranges

        folded = fold_bn_params(params)
        calib = jnp.asarray(calibration_specs(ns.calib_dir, n_wavs=32))
        ranges = observe_ranges(model, folded, calib, batch_size=4,
                                per_channel=ns.per_channel_acts)
        act_qp = {
            p: act_qparams(jnp.asarray(lo, jnp.float32),
                           jnp.asarray(hi, jnp.float32), ns.act_bits)
            for p, (lo, hi) in ranges.items()
        }
        if ns.gptq:
            from gtcrn_micro_tpu.quant.gptq import (
                augmented_hessian_specs,
                gptq_params,
            )

            hspecs = augmented_hessian_specs(model, folded, ns.calib_dir,
                                             n_clips=ns.gptq_clips)
            print(f"GPTQ: augmented Hessian corpus {tuple(hspecs.shape)}; "
                  "sequential rounding over 59 boundaries...", flush=True)
            folded = gptq_params(model, folded, act_qp, hspecs)
        if ns.integer_pc and not ns.per_channel_acts:
            parser.error("--integer_pc requires --per_channel_acts")
        name = ("gtcrn_micro_w8a%d%s%s%s.bin"
                % (ns.act_bits, "_pc" if ns.per_channel_acts else "",
                   "_v4" if ns.integer_pc else "",
                   "_gptq" if ns.gptq else ""))
        n = export_native_weights_int8(
            folded, act_qp, os.path.join(ns.out_dir, name),
            integer_pc=ns.integer_pc,
        )
        ver = ("v4 integer per-channel " if ns.integer_pc
               else "v3 per-channel " if ns.per_channel_acts else "")
        produced.append(f"GTM8 {ver}w8a{ns.act_bits} ({n} tensors, {name})")

    print(f"exported {'; '.join(produced)} to {ns.out_dir}")


if __name__ == "__main__":
    main()
