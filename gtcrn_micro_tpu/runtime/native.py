"""ctypes bindings + build driver for the native C++ streaming engine.

The native runtime (native/) is the deployment analog of the reference's
ESP32-S3 TFLite-Micro runner (esp32_s3/main/main.cc): a dependency-free C++
engine running the streaming model frame-by-frame.  pybind11 is not in this
environment, so bindings go through a C ABI (native/c_api.cc) + ctypes.

Usage:
    from gtcrn_micro_tpu.runtime.native import NativeEngine, build_native
    build_native()                       # cmake+make once
    eng = NativeEngine("weights.bin")    # io/export_native.py artifact
    out_spec = eng.step(spec_frame)      # (257, 2) -> (257, 2)
    enhanced = eng.enhance(samples)      # whole-utterance wav -> wav
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
BUILD_DIR = os.path.join(NATIVE_DIR, "build")
LIB_PATH = os.path.join(BUILD_DIR, "libgtcrn_micro.so")
CLI_PATH = os.path.join(BUILD_DIR, "gtcrn_stream")


def build_native(force: bool = False) -> str:
    """Build the shared library + CLI with cmake (cached)."""
    if os.path.exists(LIB_PATH) and not force:
        return LIB_PATH
    os.makedirs(BUILD_DIR, exist_ok=True)
    subprocess.run(
        ["cmake", "-DCMAKE_BUILD_TYPE=Release", ".."],
        cwd=BUILD_DIR, check=True, capture_output=True,
    )
    subprocess.run(
        ["make", "-j4"], cwd=BUILD_DIR, check=True, capture_output=True
    )
    return LIB_PATH


class NativeEngine:
    """One engine + one stream state (use :meth:`step_batch` for servers).

    ``quant="int8"`` (or the legacy ``int8=True``) loads a GTM8 full-integer
    artifact (io/export_native.export_native_weights_int8) through the int8
    engine -- the deployment format analog of the reference's int8 .tflite +
    TFLM (esp32_s3/main/main.cc).  ``quant="int16"`` selects the 16x8 engine
    for an act_bits=16 artifact (int16 activations / int8 weights);
    ``quant="mixed"`` is an alias for the same engine, which also executes
    GTM8 v2 mixed-precision artifacts (per-boundary 8/16 act bits).
    ``quant="pc"`` loads a GTM8 v3 per-channel-activation artifact through
    the PC engine (int8 weights dequantized at load, per-lane boundary
    fake-quant, fp32 MACs -- EVAL.md r4b: 16x8 held-out +5.4 dB).
    ``quant="v4"`` loads a GTM8 v4 full-INTEGER per-channel artifact
    (act-scale-folded int8 weights, integer MACs; int16 activation storage
    covers 8- and 16-bit boundaries); ``quant="v48"`` is the int8-storage
    variant for pure-int8 v4 grids."""

    def __init__(self, weights_path: str, lib_path: str | None = None,
                 int8: bool = False, quant: str | None = None):
        lib_path = lib_path or build_native()
        self._lib = ctypes.CDLL(lib_path)
        quant = quant or ("int8" if int8 else None)
        p = {None: "gtm_", "int8": "gtm_q", "int16": "gtm_q16",
             "mixed": "gtm_q16", "pc": "gtm_pc", "v4": "gtm_v4",
             "v48": "gtm_v48"}[quant]
        self._fn = {
            name: getattr(self._lib, f"{p}{name}")
            for name in (
                "engine_create", "engine_destroy", "state_create",
                "state_destroy", "state_reset", "step", "enhance",
                "state_batch_create", "state_batch_destroy", "step_batch",
            )
        }
        self._fn["engine_create"].restype = ctypes.c_void_p
        self._fn["engine_create"].argtypes = [ctypes.c_char_p]
        self._fn["state_create"].restype = ctypes.c_void_p
        self._fn["state_create"].argtypes = [ctypes.c_void_p]
        self._fn["state_reset"].argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        self._fn["state_batch_create"].restype = ctypes.c_void_p
        self._fn["state_batch_create"].argtypes = [
            ctypes.c_void_p, ctypes.c_int,
        ]
        fp = ctypes.POINTER(ctypes.c_float)
        self._fn["step"].argtypes = [ctypes.c_void_p, ctypes.c_void_p, fp, fp]
        self._fn["enhance"].argtypes = [
            ctypes.c_void_p, fp, ctypes.c_int, fp,
        ]
        self._fn["step_batch"].argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, fp, fp, ctypes.c_int,
        ]
        self._engine = self._fn["engine_create"](weights_path.encode())
        if not self._engine:
            raise RuntimeError(f"failed to load weights: {weights_path}")
        self._state = self._fn["state_create"](ctypes.c_void_p(self._engine))
        self._batch_states = None
        self._batch_n = 0

    def reset(self) -> None:
        self._fn["state_reset"](
            ctypes.c_void_p(self._engine), ctypes.c_void_p(self._state)
        )

    def step(self, spec_frame: np.ndarray) -> np.ndarray:
        """(257, 2) spec frame -> enhanced (257, 2)."""
        buf = np.ascontiguousarray(spec_frame.T, np.float32)  # (2, 257)
        out = np.empty((2, 257), np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        self._fn["step"](
            ctypes.c_void_p(self._engine), ctypes.c_void_p(self._state),
            buf.ctypes.data_as(fp), out.ctypes.data_as(fp),
        )
        return out.T.copy()

    def step_batch(self, spec_frames: np.ndarray) -> np.ndarray:
        """(N, 257, 2) spec frames, one per stream -> enhanced (N, 257, 2).

        Per-stream states are created lazily on the first call and persist
        across calls (a resize resets them)."""
        n = spec_frames.shape[0]
        if self._batch_states is None or n != self._batch_n:
            if self._batch_states is not None:
                self._fn["state_batch_destroy"](
                    ctypes.c_void_p(self._batch_states)
                )
            self._batch_states = self._fn["state_batch_create"](
                ctypes.c_void_p(self._engine), n
            )
            self._batch_n = n
        buf = np.ascontiguousarray(
            np.swapaxes(spec_frames, 1, 2), np.float32
        )  # (N, 2, 257)
        out = np.empty((n, 2, 257), np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        self._fn["step_batch"](
            ctypes.c_void_p(self._engine), ctypes.c_void_p(self._batch_states),
            buf.ctypes.data_as(fp), out.ctypes.data_as(fp), n,
        )
        return np.swapaxes(out, 1, 2).copy()

    def enhance(self, samples: np.ndarray) -> np.ndarray:
        """16 kHz waveform -> enhanced waveform (same length)."""
        x = np.ascontiguousarray(samples, np.float32)
        out = np.empty_like(x)
        fp = ctypes.POINTER(ctypes.c_float)
        self._fn["enhance"](
            ctypes.c_void_p(self._engine),
            x.ctypes.data_as(fp), len(x), out.ctypes.data_as(fp),
        )
        return out

    def __del__(self):
        try:
            if self._batch_states is not None:
                self._fn["state_batch_destroy"](
                    ctypes.c_void_p(self._batch_states)
                )
            self._fn["state_destroy"](ctypes.c_void_p(self._state))
            self._fn["engine_destroy"](ctypes.c_void_p(self._engine))
        except Exception:
            pass
