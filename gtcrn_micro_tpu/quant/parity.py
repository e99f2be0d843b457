"""Cross-path parity harness (reference utils/output_tests.py:10-189).

The reference compares PyTorch vs ONNXRuntime vs int8 TFLite on one wav and
reports float MAE, INT8-domain MAE and saturation stats.  Here the runtimes
are paths of ONE graph definition, so the harness compares:

- fp32 offline  vs fp32 streaming (must match to float error)
- fp32 offline  vs int8 fake-quant offline (quantization error)
- int8 offline  vs int8 streaming (quantized streaming consistency)

plus enhanced-waveform SNR and int8-domain output saturation.

CLI: ``python -m gtcrn_micro_tpu.quant.parity --wav <noisy.wav>
--checkpoint <ckpt> --calib_dir <wav dir>``
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
from gtcrn_micro_tpu.io.wav import read_wav
from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro, scan_stepper
from gtcrn_micro_tpu.quant.calibration import calibration_specs
from gtcrn_micro_tpu.quant.fake_quant import (
    act_qparams,
    quantize,
    saturation_fraction,
)
from gtcrn_micro_tpu.quant.ptq import make_quantized_model


def snr_db(ref: np.ndarray, est: np.ndarray) -> float:
    noise = ref - est
    return float(
        10 * np.log10((np.sum(ref**2) + 1e-12) / (np.sum(noise**2) + 1e-12))
    )


def run_parity(model, params, qmodel, spec) -> dict[str, float]:
    """spec: (1, F, T, 2).  Returns the parity report dict."""
    window = sqrt_hann_window(512)

    fp32 = np.asarray(jax.jit(model.apply)(params, spec))
    q = np.asarray(jax.jit(qmodel.apply)(params, spec))

    state = model.init_state(1)
    fp32_stream, _ = jax.jit(model.scan_frames)(params, state, spec)
    fp32_stream = np.asarray(fp32_stream)

    q_stream, _ = jax.jit(
        lambda p, s, sp: scan_stepper(qmodel.step, p, s, sp)
    )(params, qmodel.init_state(1), spec)
    q_stream = np.asarray(q_stream)

    wav_fp32 = np.asarray(istft(jnp.asarray(fp32), window))
    wav_q = np.asarray(istft(jnp.asarray(q), window))

    # int8-domain MAE over the output spec (reference :143-150): quantize
    # both outputs with the fp32 output's observed range
    out_qp = act_qparams(jnp.min(fp32), jnp.max(fp32))
    q_fp32 = quantize(jnp.asarray(fp32), out_qp).astype(np.int32)
    q_q = quantize(jnp.asarray(q), out_qp).astype(np.int32)
    # saturation diagnostic (reference output_tests.py:116-135): fraction of
    # the quantized model's outputs clipped by the fp32-calibrated range
    out_sat = float(saturation_fraction(jnp.asarray(q), out_qp))

    return {
        "int8_out_saturation": out_sat,
        "stream_vs_offline_fp32_max": float(np.abs(fp32 - fp32_stream).max()),
        "stream_vs_offline_int8_max": float(np.abs(q - q_stream).max()),
        "fp32_vs_int8_mae": float(np.abs(fp32 - q).mean()),
        "fp32_vs_int8_median_ae": float(np.median(np.abs(fp32 - q))),
        "int8_domain_mae": float(np.abs(np.asarray(q_fp32) - np.asarray(q_q)).mean()),
        "enhanced_wav_snr_db": snr_db(wav_fp32, wav_q),
    }


def main(args=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--wav", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--calib_dir", required=True)
    parser.add_argument("--n_calib", type=int, default=16)
    parser.add_argument("--act_bits", type=int, default=8, choices=(8, 16))
    parser.add_argument("--percentile", type=float, default=99.99)
    ns = parser.parse_args(args)

    from gtcrn_micro_tpu.eval.infer import load_params

    model = GTCRNMicro()
    params = load_params(ns.checkpoint)
    calib = calibration_specs(ns.calib_dir, n_wavs=ns.n_calib, max_frames=973)
    qmodel = make_quantized_model(
        model, params, calib, percentile=ns.percentile, act_bits=ns.act_bits
    )

    x, fs = read_wav(ns.wav)
    if x.ndim > 1:
        x = x[:, 0]
    window = sqrt_hann_window(512)
    spec = stft(jnp.asarray(x, jnp.float32)[None], window)

    report = run_parity(model, params, qmodel, spec)
    for k, v in report.items():
        print(f"{k}: {v:.6g}")


if __name__ == "__main__":
    main()
