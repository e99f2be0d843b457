"""Audio-level serving-step export round-trips.

The deployable artifact must be the SERVED program — online STFT ->
streaming model step -> online iSTFT (dsp/stream_dsp.make_audio_step),
the thing bench.py measures — not just the spec-in/spec-out model the
reference exports (stream_onnx.py:15-129).  Both portable formats are
round-tripped here with state threaded across steps:

- StableHLO (jax.export) reloaded via jax.export.deserialize
- ONNX (opset 16, MXU-DFT matmul lowering) re-executed through the
  in-repo interpreter (io/onnx.py)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.dsp import stream_dsp
from gtcrn_micro_tpu.dsp.stft import sqrt_hann_window
from gtcrn_micro_tpu.models import GTCRNMicro


@pytest.fixture(scope="module")
def model_params():
    model = GTCRNMicro()
    return model, model.init(jax.random.PRNGKey(0))


def _drive_direct(model, params, chunks, *, dft, ring):
    window = sqrt_hann_window(model.config.win_len)
    step = stream_dsp.make_audio_step(model, window, dft=dft)
    dsp = stream_dsp.init_dsp_state(chunks[0].shape[0])
    mstate = model.init_state(chunks[0].shape[0], ring=ring)
    outs = []
    for c in chunks:
        out, dsp, mstate = step(params, dsp, mstate, c)
        outs.append(np.asarray(out))
    return outs


def test_stablehlo_audio_roundtrip(model_params, tmp_path):
    from gtcrn_micro_tpu.io.export_stablehlo import export_audio, load_exported

    model, params = model_params
    blob = export_audio(model, params, batch=1, chunk_hops=1, dft="mxu")
    path = tmp_path / "audio.stablehlo"
    path.write_bytes(blob)
    exported = load_exported(str(path))

    rng = np.random.default_rng(0)
    chunks = [jnp.asarray(rng.standard_normal((1, 256)) * 0.1, jnp.float32)
              for _ in range(4)]
    want = _drive_direct(model, params, chunks, dft="mxu", ring=True)

    in_buf = jnp.zeros((1, 256), jnp.float32)
    ola_buf = jnp.zeros((1, 256), jnp.float32)
    mstate = model.init_state(1)
    for c, w in zip(chunks, want):
        out, in_buf, ola_buf, mstate = exported.call(
            params, in_buf, ola_buf, mstate, c
        )
        np.testing.assert_allclose(np.asarray(out), w, atol=1e-6)


def test_onnx_audio_roundtrip(model_params):
    from gtcrn_micro_tpu.io.onnx import OnnxModel
    from gtcrn_micro_tpu.io.onnx_export import export_audio_onnx

    model, params = model_params
    blob = export_audio_onnx(model, params, batch=1)
    om = OnnxModel(blob)

    rng = np.random.default_rng(1)
    chunks = [jnp.asarray(rng.standard_normal((1, 256)) * 0.1, jnp.float32)
              for _ in range(3)]
    want = _drive_direct(model, params, chunks, dft="mxu", ring=False)

    state = model.init_state(1, ring=False)
    keys = sorted(state)
    flat = [np.zeros((1, 256), np.float32), np.zeros((1, 256), np.float32)] \
        + [np.asarray(state[k]) for k in keys]
    for c, w in zip(chunks, want):
        got = om(*flat, np.asarray(c))
        np.testing.assert_allclose(got[0], w, atol=1e-5, rtol=1e-5)
        flat = list(got[1:])


def test_audio_artifact_matches_offline_pipeline(model_params):
    """The exported step, driven over a whole utterance, reproduces the
    offline stft -> model -> istft pipeline (online-DSP contract: output
    one hop behind, first emitted chunk is the center-trim region, first
    257 input samples silent for analysis bit-identity)."""
    from gtcrn_micro_tpu.dsp.stft import istft, stft
    from gtcrn_micro_tpu.io.export_stablehlo import export_audio

    model, params = model_params
    blob = export_audio(model, params, batch=1, chunk_hops=1, dft="fft")
    from jax import export as jexport

    exported = jexport.deserialize(bytearray(blob))

    rng = np.random.default_rng(2)
    n = 256 * 12
    audio = rng.standard_normal(n).astype(np.float32) * 0.1
    audio[:257] = 0.0
    x = jnp.asarray(audio)[None]

    window = sqrt_hann_window(model.config.win_len)
    spec = stft(x, window)
    enh = model.apply(params, spec)
    offline = np.asarray(istft(enh, window, length=n))[0]

    in_buf = jnp.zeros((1, 256), jnp.float32)
    ola_buf = jnp.zeros((1, 256), jnp.float32)
    mstate = model.init_state(1)
    outs = []
    for t in range(12):
        out, in_buf, ola_buf, mstate = exported.call(
            params, in_buf, ola_buf, mstate, x[:, 256 * t: 256 * (t + 1)]
        )
        outs.append(np.asarray(out)[0])
    streamed = np.concatenate(outs)
    # drop the center-trim chunk; streamed runs one hop behind
    np.testing.assert_allclose(
        streamed[256:], offline[: n - 256], atol=2e-4
    )
