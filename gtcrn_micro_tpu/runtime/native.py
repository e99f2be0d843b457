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
    """One engine + one stream state (create several for multiple streams)."""

    def __init__(self, weights_path: str, lib_path: str | None = None):
        lib_path = lib_path or build_native()
        self._lib = ctypes.CDLL(lib_path)
        self._lib.gtm_engine_create.restype = ctypes.c_void_p
        self._lib.gtm_engine_create.argtypes = [ctypes.c_char_p]
        self._lib.gtm_state_create.restype = ctypes.c_void_p
        self._lib.gtm_step.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        self._lib.gtm_enhance.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        self._engine = self._lib.gtm_engine_create(weights_path.encode())
        if not self._engine:
            raise RuntimeError(f"failed to load weights: {weights_path}")
        self._state = self._lib.gtm_state_create()

    def reset(self) -> None:
        self._lib.gtm_state_reset(ctypes.c_void_p(self._state))

    def step(self, spec_frame: np.ndarray) -> np.ndarray:
        """(257, 2) spec frame -> enhanced (257, 2)."""
        buf = np.ascontiguousarray(spec_frame.T, np.float32)  # (2, 257)
        out = np.empty((2, 257), np.float32)
        self._lib.gtm_step(
            ctypes.c_void_p(self._engine), ctypes.c_void_p(self._state),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out.T.copy()

    def enhance(self, samples: np.ndarray) -> np.ndarray:
        """16 kHz waveform -> enhanced waveform (same length)."""
        x = np.ascontiguousarray(samples, np.float32)
        out = np.empty_like(x)
        self._lib.gtm_enhance(
            ctypes.c_void_p(self._engine),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out

    def __del__(self):
        try:
            self._lib.gtm_state_destroy(ctypes.c_void_p(self._state))
            self._lib.gtm_engine_destroy(ctypes.c_void_p(self._engine))
        except Exception:
            pass
