"""PTQ calibration-set builder (reference utils/calibration_data.py).

Reads up to ``n_wavs`` wavs, sqrt-Hann STFTs them, pads/truncates to
``max_frames`` frames, computes the global input scale
``2 * p99.99(|x|) * 1.06`` (reference :97-98; shipped value
streaming/tflite/calib_scale.txt = 19.944...), and returns/saves the
normalized ``x/scale + 0.5`` tensor used to calibrate the int8 input.

The model-facing helper ``calibration_specs`` returns the UN-normalized
(N, F, T, 2) spec batch our PTQ observer consumes directly (the observer
derives per-layer ranges itself; the global scale is only the model-input
quantization step).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from gtcrn_micro_tpu.dsp.stft import sqrt_hann_window, stft
from gtcrn_micro_tpu.io.wav import find_wavs, read_wav


def build_calibration(
    wav_dir: str,
    n_wavs: int = 300,
    max_frames: int = 973,
    out_npy: str | None = None,
    out_scale: str | None = None,
) -> tuple[np.ndarray, float]:
    """Returns (normalized (N, T, F, 2) data, scale) like the reference."""
    specs = _load_specs(wav_dir, n_wavs, max_frames, assert_fs=True)
    stacked = specs.transpose(0, 2, 1, 3)  # (N, T, F, 2) like the reference

    scale = float(2.0 * np.percentile(np.abs(stacked), 99.99) * 1.06)
    normalized = np.clip(stacked / scale + 0.5, 0.0, 1.0).astype(np.float32)

    if out_npy:
        os.makedirs(os.path.dirname(out_npy) or ".", exist_ok=True)
        np.save(out_npy, normalized)
    if out_scale:
        with open(out_scale, "w") as f:
            f.write(f"{scale}\n")
    return normalized, scale


def _load_specs(
    wav_dir: str, n_wavs: int, max_frames: int, assert_fs: bool = False
) -> np.ndarray:
    """(N, F, T=max_frames, 2) spec batch: waveforms padded/truncated to ONE
    static length, then a single batched STFT (one XLA compile, not one per
    distinct wav length)."""
    window = sqrt_hann_window(512)
    wavs = sorted(find_wavs(wav_dir))[:n_wavs]
    if not wavs:
        raise FileNotFoundError(f"no wavs under {wav_dir}")
    # n_samples such that n_samples//256 + 1 == max_frames
    n_samples = (max_frames - 1) * 256
    batch = np.zeros((len(wavs), n_samples), np.float32)
    for i, path in enumerate(wavs):
        x, fs = read_wav(path)
        if x.ndim > 1:
            x = x[:, 0]
        if assert_fs:
            assert fs == 16000, f"Expected 16kHz, got {fs} ({path})"
        n = min(len(x), n_samples)
        batch[i, :n] = x[:n]
    return np.asarray(
        stft(jnp.asarray(batch), window), dtype=np.float32
    )  # (N, F, T, 2)


def calibration_specs(
    wav_dir: str, n_wavs: int = 32, max_frames: int = 973
) -> np.ndarray:
    """(N, F, T, 2) un-normalized spec batch for ``quant.ptq.observe_ranges``.

    Asserts 16 kHz input like ``build_calibration`` -- calibrating on
    unresampled audio silently mis-scales every activation range."""
    return _load_specs(wav_dir, n_wavs, max_frames, assert_fs=True)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--wav_dir", required=True)
    parser.add_argument("--n_wavs", type=int, default=300)
    parser.add_argument("--max_frames", type=int, default=973)
    parser.add_argument("--out_npy", default="calibration.npy")
    parser.add_argument("--out_scale", default="calib_scale.txt")
    ns = parser.parse_args()
    data, scale = build_calibration(
        ns.wav_dir, ns.n_wavs, ns.max_frames, ns.out_npy, ns.out_scale
    )
    print(f"calibration data {data.shape}, scale={scale}")
