"""Native C++ runtime parity: engine output == JAX streaming model.

The native engine (native/) is the deployment analog of the reference's
ESP32/TFLM runner; golden test = cross-runtime parity (reference
utils/output_tests.py pattern)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.io.export_native import (
    export_native_weights,
    load_native_weights,
)
from gtcrn_micro_tpu.models import GTCRNMicro

pytestmark = pytest.mark.skipif(
    shutil.which("cmake") is None or shutil.which("make") is None,
    reason="no native toolchain",
)


@pytest.fixture(scope="module")
def native(tmp_path_factory):
    from gtcrn_micro_tpu.runtime.native import NativeEngine, build_native

    build_native()
    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    wpath = str(tmp_path_factory.mktemp("native") / "weights.bin")
    n = export_native_weights(params, wpath)
    assert n == 158
    return model, params, wpath, NativeEngine(wpath)


def test_weights_roundtrip(native):
    _model, _params, wpath, _eng = native
    tensors = load_native_weights(wpath)
    assert len(tensors) == 158
    assert tensors[0].shape == (64, 192)  # bm_w


def test_native_step_matches_jax_streaming(native):
    model, params, _wpath, eng = native
    rng = np.random.default_rng(0)
    T = 20  # covers the 16-slot ring wrap
    spec = rng.standard_normal((1, 257, T, 2)).astype(np.float32) * 0.3
    state = model.init_state(1, ring=True)
    eng.reset()
    errs = []
    for t in range(T):
        y_jax, state = model.step(params, state, jnp.asarray(spec[:, :, t : t + 1]))
        y_nat = eng.step(spec[0, :, t, :])
        errs.append(np.abs(np.asarray(y_jax)[0, :, 0, :] - y_nat).max())
    assert max(errs) < 1e-5, errs


def test_native_enhance_wav_runs(native):
    _model, _params, _wpath, eng = native
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = eng.enhance(x)
    assert out.shape == x.shape
    assert np.isfinite(out).all()


def test_cli_roundtrip(native, tmp_path):
    from gtcrn_micro_tpu.io.wav import read_wav, write_wav
    from gtcrn_micro_tpu.runtime.native import CLI_PATH

    _model, _params, wpath, _eng = native
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    inp, outp = str(tmp_path / "in.wav"), str(tmp_path / "out.wav")
    write_wav(inp, x, 16000)
    res = subprocess.run(
        [CLI_PATH, wpath, inp, outp], capture_output=True, text=True
    )
    assert res.returncode == 0, res.stderr
    assert "real-time" in res.stdout
    y, fs = read_wav(outp)
    assert fs == 16000 and len(y) == len(x)
