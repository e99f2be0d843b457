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


@pytest.fixture(scope="module")
def native_int8(tmp_path_factory, native):
    """GTM8 artifact + int8 engine + the JAX fake-quant oracle pieces."""
    from gtcrn_micro_tpu.io.export_native import export_native_weights_int8
    from gtcrn_micro_tpu.models.folding import fold_bn_params
    from gtcrn_micro_tpu.quant.fake_quant import act_qparams
    from gtcrn_micro_tpu.quant.ptq import observe_ranges
    from gtcrn_micro_tpu.runtime.native import NativeEngine

    model, params, _wpath, _eng = native
    folded = fold_bn_params(params)
    rng = np.random.default_rng(3)
    calib = jnp.asarray(
        rng.standard_normal((4, 257, 16, 2)).astype(np.float32) * 0.3
    )
    ranges = observe_ranges(model, folded, calib, batch_size=4)
    act_qp = {
        p: act_qparams(jnp.float32(lo), jnp.float32(hi), 8)
        for p, (lo, hi) in ranges.items()
    }
    wpath8 = str(tmp_path_factory.mktemp("native8") / "weights_int8.bin")
    n = export_native_weights_int8(folded, act_qp, wpath8)
    assert n == 158
    return model, folded, act_qp, wpath8, NativeEngine(wpath8, int8=True)


def test_native_int8_matches_fake_quant_sim(native_int8):
    """Full-integer native engine == the JAX int8 fake-quant simulation on
    BN-folded params: the int8 artifact and the PTQ/QAT simulation are the
    SAME quantization scheme (fold-then-quantize, per-channel weights,
    per-tensor acts), so they must agree to float associativity."""
    from gtcrn_micro_tpu.quant.ptq import QuantizedModel

    model, folded, act_qp, _wpath8, eng8 = native_int8
    qm = QuantizedModel(model=model, act_qp=act_qp)
    rng = np.random.default_rng(4)
    T = 20  # past the ring wrap
    spec = rng.standard_normal((1, 257, T, 2)).astype(np.float32) * 0.3
    state = qm.init_state(1)
    eng8.reset()
    errs, mags = [], []
    for t in range(T):
        y_jax, state = qm.step(folded, state, jnp.asarray(spec[:, :, t:t+1]))
        y_nat = eng8.step(spec[0, :, t, :])
        errs.append(np.abs(np.asarray(y_jax)[0, :, 0, :] - y_nat).max())
        mags.append(np.abs(np.asarray(y_jax)).max())
    assert max(errs) < 5e-4 * max(max(mags), 1.0), (errs, mags)


def test_native_int8_enhance_runs(native_int8):
    _m, _f, _q, _w, eng8 = native_int8
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    out = eng8.enhance(x)
    assert out.shape == x.shape and np.isfinite(out).all()


def test_step_batch_matches_sequential(native):
    """Multi-stream serving API: StepBatch(n) == n independent engines."""
    from gtcrn_micro_tpu.runtime.native import NativeEngine

    _model, _params, wpath, _eng = native
    rng = np.random.default_rng(6)
    N, T = 3, 6
    spec = rng.standard_normal((N, 257, T, 2)).astype(np.float32) * 0.3

    batch_eng = NativeEngine(wpath)
    singles = [NativeEngine(wpath) for _ in range(N)]
    for t in range(T):
        got = batch_eng.step_batch(spec[:, :, t, :])
        for i in range(N):
            want = singles[i].step(spec[i, :, t, :])
            np.testing.assert_array_equal(got[i], want)


def test_int8_step_batch_matches_sequential(native_int8):
    from gtcrn_micro_tpu.runtime.native import NativeEngine

    _m, _f, _q, wpath8, _eng8 = native_int8
    rng = np.random.default_rng(7)
    N, T = 2, 5
    spec = rng.standard_normal((N, 257, T, 2)).astype(np.float32) * 0.3
    batch_eng = NativeEngine(wpath8, int8=True)
    singles = [NativeEngine(wpath8, int8=True) for _ in range(N)]
    for t in range(T):
        got = batch_eng.step_batch(spec[:, :, t, :])
        for i in range(N):
            np.testing.assert_array_equal(
                got[i], singles[i].step(spec[i, :, t, :])
            )


def test_cli_int8_and_bench(native_int8, tmp_path):
    from gtcrn_micro_tpu.io.wav import read_wav, write_wav
    from gtcrn_micro_tpu.runtime.native import CLI_PATH

    _m, _f, _q, wpath8, _eng8 = native_int8
    rng = np.random.default_rng(8)
    x = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    inp, outp = str(tmp_path / "in.wav"), str(tmp_path / "out.wav")
    write_wav(inp, x, 16000)
    res = subprocess.run(
        [CLI_PATH, "--int8", wpath8, inp, outp], capture_output=True, text=True
    )
    assert res.returncode == 0, res.stderr
    y, fs = read_wav(outp)
    assert fs == 16000 and len(y) == len(x)
    res = subprocess.run(
        [CLI_PATH, "--int8", "--bench", wpath8, "4"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    assert "us/frame/stream" in res.stdout


def test_native_mixed_matches_sim(native):
    """GTM8 v2 mixed-precision artifact (per-boundary 8/16 act bits): the
    int16 engine must reproduce the mixed fake-quant simulation exactly --
    including int8-grid CLIPPING at the unlifted boundaries -- and the int8
    engine must reject the artifact loudly."""
    from gtcrn_micro_tpu.io.export_native import export_native_weights_int8
    from gtcrn_micro_tpu.models.folding import fold_bn_params
    from gtcrn_micro_tpu.quant.mixed import compose_act_qp
    from gtcrn_micro_tpu.quant.ptq import QuantizedModel, observe_ranges
    from gtcrn_micro_tpu.runtime.native import NativeEngine

    model, params, _wpath, _eng = native
    folded = fold_bn_params(params)
    rng = np.random.default_rng(10)
    calib = jnp.asarray(
        rng.standard_normal((4, 257, 16, 2)).astype(np.float32) * 0.3
    )
    ranges = observe_ranges(model, folded, calib, batch_size=4)
    # lift a spread of boundaries: first conv, a ring-feeding depthwise, a
    # TRA energy (integer ring at int16 while its block's gate stays int8),
    # and the final mask conv
    lifted = {"encoder/en0/conv/in", "encoder/en3/depth_conv/in",
              "decoder/de1/tra/energy", "decoder/de4/conv/in"}
    act_qp = compose_act_qp(ranges, lifted)

    import tempfile

    wpath_m = tempfile.mktemp(suffix="_mixed.bin")
    export_native_weights_int8(folded, act_qp, wpath_m)
    with pytest.raises(RuntimeError):
        NativeEngine(wpath_m, int8=True)  # int8 engine: loud reject
    eng_m = NativeEngine(wpath_m, quant="mixed")

    qm = QuantizedModel(model=model, act_qp=act_qp)
    spec = rng.standard_normal((1, 257, 20, 2)).astype(np.float32) * 0.3
    state = qm.init_state(1)
    errs, mags = [], []
    for t in range(20):  # past the ring wrap
        y_sim, state = qm.step(folded, state,
                               jnp.asarray(spec[:, :, t : t + 1]))
        y_nat = eng_m.step(spec[0, :, t, :])
        errs.append(np.abs(np.asarray(y_sim)[0, :, 0, :] - y_nat).max())
        mags.append(np.abs(np.asarray(y_sim)).max())
    assert max(errs) < 5e-4 * max(max(mags), 1.0), (errs, mags)
    os.unlink(wpath_m)


def test_native_16x8_matches_sim_and_tracks_fp32(native):
    """16x8 mode (int16 acts / int8 weights): parity vs the act_bits=16
    fake-quant simulation AND close to the fp32 engine on in-distribution
    input (the quality-viable quantized mode, EVAL.md)."""
    from gtcrn_micro_tpu.io.export_native import export_native_weights_int8
    from gtcrn_micro_tpu.models.folding import fold_bn_params
    from gtcrn_micro_tpu.quant.fake_quant import act_qparams
    from gtcrn_micro_tpu.quant.ptq import QuantizedModel, observe_ranges
    from gtcrn_micro_tpu.runtime.native import NativeEngine

    model, params, _wpath, eng_fp32 = native
    folded = fold_bn_params(params)
    rng = np.random.default_rng(9)
    calib = jnp.asarray(
        rng.standard_normal((4, 257, 16, 2)).astype(np.float32) * 0.3
    )
    ranges = observe_ranges(model, folded, calib, batch_size=4)
    act_qp = {
        p: act_qparams(jnp.float32(lo), jnp.float32(hi), 16)
        for p, (lo, hi) in ranges.items()
    }
    import tempfile

    wpath16 = tempfile.mktemp(suffix="_w16.bin")
    export_native_weights_int8(folded, act_qp, wpath16)
    eng16 = NativeEngine(wpath16, quant="int16")
    # loading a 16-bit artifact through the int8 engine must fail loudly
    with pytest.raises(RuntimeError):
        NativeEngine(wpath16, int8=True)

    qm = QuantizedModel(model=model, act_qp=act_qp)
    spec = rng.standard_normal((1, 257, 8, 2)).astype(np.float32) * 0.3
    state = qm.init_state(1)
    eng_fp32.reset()
    for t in range(8):
        y_sim, state = qm.step(folded, state,
                               jnp.asarray(spec[:, :, t : t + 1]))
        y_nat = eng16.step(spec[0, :, t, :])
        y_fp = eng_fp32.step(spec[0, :, t, :])
        err_sim = np.abs(np.asarray(y_sim)[0, :, 0, :] - y_nat).max()
        assert err_sim < 5e-4, (t, err_sim)
        # int16 acts leave int8 WEIGHT rounding as the only material error
        # (EVAL.md sensitivity analysis); on random-init weights that is a
        # few percent of the output scale
        assert np.abs(y_nat - y_fp).max() < 0.2, t
        assert np.abs(y_nat - y_fp).mean() < 0.01, t
    os.unlink(wpath16)


def test_cli_online_matches_jax_audio_scan(native, tmp_path):
    """--online (dsp::AudioStream, O(1) carried framing state) == the JAX
    online audio pipeline (dsp/stream_dsp.py), same stream-open and one-hop
    -delay contract, within the int16 wav IO floor."""
    from gtcrn_micro_tpu.dsp.stft import sqrt_hann_window
    from gtcrn_micro_tpu.dsp.stream_dsp import (
        init_dsp_state,
        make_audio_scan,
    )
    from gtcrn_micro_tpu.io.wav import read_wav, write_wav
    from gtcrn_micro_tpu.runtime.native import CLI_PATH

    model, params, wpath, _eng = native
    rng = np.random.default_rng(4)
    hops = 40
    x = (rng.standard_normal(256 * hops) * 0.1).astype(np.float32)
    inp, outp = str(tmp_path / "in.wav"), str(tmp_path / "out.wav")
    write_wav(inp, x, 16000)
    res = subprocess.run(
        [CLI_PATH, "--online", wpath, inp, outp],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    y_nat, _fs = read_wav(outp)

    # the wav on disk went through int16 quantization twice (in + out), so
    # regenerate the JAX reference from the SAME int16-rounded input
    x_rt, _ = read_wav(inp)
    scan = jax.jit(
        make_audio_scan(model, sqrt_hann_window(512)), donate_argnums=(1, 2)
    )
    y, _, _ = scan(params, init_dsp_state(1), model.init_state(1),
                   jnp.asarray(x_rt[None]))
    y_jax = np.asarray(y)[0, 256:]  # drop the center-trim hop, like the CLI

    n = min(len(y_nat), len(y_jax))
    err = y_nat[:n] - y_jax[:n]
    den = float((y_jax[:n] ** 2).sum())
    snr = 10 * np.log10(max(den, 1e-20) / max(float((err**2).sum()), 1e-20))
    assert snr > 55.0, snr  # int16 wav IO floor ~66 dB; margin for content


def test_cli_int16_bench_and_online(native_int8, tmp_path):
    """16x8 engine through --bench (r2 advice: its states must pass through
    InitState, not default-constructed rings) and --online streaming."""
    from gtcrn_micro_tpu.io.export_native import export_native_weights_int8
    from gtcrn_micro_tpu.io.wav import read_wav, write_wav
    from gtcrn_micro_tpu.quant.fake_quant import act_qparams
    from gtcrn_micro_tpu.runtime.native import CLI_PATH

    model, folded, act_qp, _wpath8, _eng8 = native_int8
    qp16 = {
        p: act_qparams(jnp.float32((qp.qmin - qp.zero) * qp.scale),
                       jnp.float32((qp.qmax - qp.zero) * qp.scale), 16)
        for p, qp in act_qp.items()
    }
    wpath16 = str(tmp_path / "w16.bin")
    export_native_weights_int8(folded, qp16, wpath16)

    res = subprocess.run(
        [CLI_PATH, "--int16", "--bench", wpath16, "2"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    assert "us/frame/stream" in res.stdout

    rng = np.random.default_rng(9)
    x = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    inp, outp = str(tmp_path / "in.wav"), str(tmp_path / "out.wav")
    write_wav(inp, x, 16000)
    res = subprocess.run(
        [CLI_PATH, "--int16", "--online", wpath16, inp, outp],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    y, fs = read_wav(outp)
    assert fs == 16000 and len(y) == (len(x) // 256) * 256


def test_cli_rejects_corrupt_gtm8(native_int8, tmp_path):
    """A truncated/corrupted GTM8 must fail with the descriptive loader
    error (r2 advice: dims validated BEFORE allocation), never a crash."""
    from gtcrn_micro_tpu.runtime.native import CLI_PATH

    _m, _f, _q, wpath8, _eng8 = native_int8
    blob = bytearray(open(wpath8, "rb").read())

    truncated = str(tmp_path / "trunc.gtm8")
    open(truncated, "wb").write(bytes(blob[: len(blob) // 3]))

    corrupted = str(tmp_path / "corrupt.gtm8")
    bad = bytearray(blob)
    # stomp the FIRST tensor's rank field (byte 8, right after
    # magic+count): must hit the pre-allocation bound check, not bad_alloc
    bad[8:12] = (0xFFFFFFF0).to_bytes(4, "little")
    open(corrupted, "wb").write(bytes(bad))

    for path in (truncated, corrupted):
        res = subprocess.run(
            [CLI_PATH, "--int8", "--bench", path, "1"],
            capture_output=True, text=True, timeout=60,
        )
        assert res.returncode != 0, path
        assert "failed to load weights" in res.stderr, (path, res.stderr)


def test_native_pc_matches_per_channel_sim(native):
    """GTM8 v3 (per-channel activation scales, r4b): the PC engine must
    reproduce the per-channel fake-quant simulation -- the artifact whose
    measured quality is the 29.7 dB held-out 16x8 row in EVAL.md -- and
    the per-tensor engines must reject the v3 artifact loudly (and vice
    versa)."""
    from gtcrn_micro_tpu.io.export_native import export_native_weights_int8
    from gtcrn_micro_tpu.models.folding import fold_bn_params
    from gtcrn_micro_tpu.quant.fake_quant import act_qparams
    from gtcrn_micro_tpu.quant.ptq import QuantizedModel, observe_ranges
    from gtcrn_micro_tpu.runtime.native import NativeEngine

    model, params, wpath_fp32, _eng = native
    folded = fold_bn_params(params)
    rng = np.random.default_rng(11)
    calib = jnp.asarray(
        rng.standard_normal((4, 257, 16, 2)).astype(np.float32) * 0.3
    )
    ranges = observe_ranges(model, folded, calib, batch_size=4,
                            per_channel=True)
    act_qp = {
        p: act_qparams(jnp.asarray(lo, jnp.float32),
                       jnp.asarray(hi, jnp.float32), 16)
        for p, (lo, hi) in ranges.items()
    }

    import tempfile

    wpath_pc = tempfile.mktemp(suffix="_pc.bin")
    export_native_weights_int8(folded, act_qp, wpath_pc)
    # cross-engine rejects: v3 through the int engines, v1 through pc
    with pytest.raises(RuntimeError):
        NativeEngine(wpath_pc, quant="int8")
    with pytest.raises(RuntimeError):
        NativeEngine(wpath_pc, quant="int16")
    with pytest.raises(RuntimeError):
        NativeEngine(wpath_fp32, quant="pc")

    eng = NativeEngine(wpath_pc, quant="pc")
    qm = QuantizedModel(model=model, act_qp=act_qp)
    spec = rng.standard_normal((1, 257, 20, 2)).astype(np.float32) * 0.3
    state = qm.init_state(1)
    errs, mags = [], []
    for t in range(20):  # past the ring wrap
        y_sim, state = qm.step(folded, state,
                               jnp.asarray(spec[:, :, t : t + 1]))
        y_nat = eng.step(spec[0, :, t, :])
        errs.append(np.abs(np.asarray(y_sim)[0, :, 0, :] - y_nat).max())
        mags.append(np.abs(np.asarray(y_sim)).max())
    assert max(errs) < 5e-4 * max(max(mags), 1.0), (errs, mags)

    # reset + batch API on the pc engine
    eng.reset()
    y2 = eng.step(spec[0, :, 0, :])
    state2 = qm.init_state(1)
    y_sim2, _ = qm.step(folded, state2, jnp.asarray(spec[:, :, 0:1]))
    assert np.abs(np.asarray(y_sim2)[0, :, 0, :] - y2).max() < 5e-4
    os.unlink(wpath_pc)


def test_native_v4_matches_integer_pc_sim(native, tmp_path):
    """GTM8 v4 (full-INTEGER per-channel, VERDICT r4 item 3): the v4 engine
    runs integer MACs under per-lane activation scales by quantizing each
    weight on its act-scale-folded tensor at export.  It must reproduce
    the ``QuantizedModel(v4=True)`` fake-quant simulation, and the v3/v1
    engines must reject the v4 artifact loudly (and vice versa).
    Deployment analog: the reference's full-integer TFLM runner
    (esp32_s3/main/main.cc:85-117)."""
    from gtcrn_micro_tpu.io.export_native import export_native_weights_int8
    from gtcrn_micro_tpu.models.folding import fold_bn_params
    from gtcrn_micro_tpu.quant.fake_quant import act_qparams
    from gtcrn_micro_tpu.quant.ptq import QuantizedModel, observe_ranges
    from gtcrn_micro_tpu.runtime.native import NativeEngine

    model, params, wpath_fp32, _eng = native
    folded = fold_bn_params(params)
    rng = np.random.default_rng(17)
    calib = jnp.asarray(
        rng.standard_normal((4, 257, 16, 2)).astype(np.float32) * 0.3
    )
    ranges = observe_ranges(model, folded, calib, batch_size=4,
                            per_channel=True)
    act_qp = {
        p: act_qparams(jnp.asarray(lo, jnp.float32),
                       jnp.asarray(hi, jnp.float32), 16)
        for p, (lo, hi) in ranges.items()
    }

    wpath_v4 = str(tmp_path / "w_v4.bin")
    export_native_weights_int8(folded, act_qp, wpath_v4, integer_pc=True)
    # cross-engine rejects: v4 through v3/per-tensor engines, v1/v3 via v4
    for q in ("int8", "int16", "pc"):
        with pytest.raises(RuntimeError):
            NativeEngine(wpath_v4, quant=q)
    with pytest.raises(RuntimeError):
        NativeEngine(wpath_fp32, quant="v4")
    wpath_v3 = str(tmp_path / "w_v3.bin")
    export_native_weights_int8(folded, act_qp, wpath_v3)
    with pytest.raises(RuntimeError):
        NativeEngine(wpath_v3, quant="v4")
    # 16-bit boundaries through the int8-storage variant must reject
    with pytest.raises(RuntimeError):
        NativeEngine(wpath_v4, quant="v48")

    eng = NativeEngine(wpath_v4, quant="v4")
    qm = QuantizedModel(model=model, act_qp=act_qp, v4=True)
    spec = rng.standard_normal((1, 257, 20, 2)).astype(np.float32) * 0.3
    state = qm.init_state(1)
    errs, mags = [], []
    for t in range(20):  # past the ring wrap
        y_sim, state = qm.step(folded, state,
                               jnp.asarray(spec[:, :, t : t + 1]))
        y_nat = eng.step(spec[0, :, t, :])
        errs.append(np.abs(np.asarray(y_sim)[0, :, 0, :] - y_nat).max())
        mags.append(np.abs(np.asarray(y_sim)).max())
    assert max(errs) < 5e-4 * max(max(mags), 1.0), (errs, mags)

    # reset + batch API
    eng.reset()
    y2 = eng.step(spec[0, :, 0, :])
    state2 = qm.init_state(1)
    y_sim2, _ = qm.step(folded, state2, jnp.asarray(spec[:, :, 0:1]))
    assert np.abs(np.asarray(y_sim2)[0, :, 0, :] - y2).max() < 5e-4
    yb = eng.step_batch(np.repeat(spec[:, :, 0, :], 3, axis=0))
    assert yb.shape == (3, 257, 2)
    assert np.abs(yb - yb[0]).max() == 0.0


def test_native_v48_pure_int8_grid(native, tmp_path):
    """A pure-int8 v4 artifact must run through the int8-storage engine
    (``quant="v48"``) and agree with the int16-storage engine exactly --
    the grids coincide, so the stored activations are the same integers."""
    from gtcrn_micro_tpu.io.export_native import export_native_weights_int8
    from gtcrn_micro_tpu.models.folding import fold_bn_params
    from gtcrn_micro_tpu.quant.fake_quant import act_qparams
    from gtcrn_micro_tpu.quant.ptq import observe_ranges
    from gtcrn_micro_tpu.runtime.native import NativeEngine

    model, params, _wpath_fp32, _eng = native
    folded = fold_bn_params(params)
    rng = np.random.default_rng(23)
    calib = jnp.asarray(
        rng.standard_normal((4, 257, 16, 2)).astype(np.float32) * 0.3
    )
    ranges = observe_ranges(model, folded, calib, batch_size=4,
                            per_channel=True)
    act_qp = {
        p: act_qparams(jnp.asarray(lo, jnp.float32),
                       jnp.asarray(hi, jnp.float32), 8)
        for p, (lo, hi) in ranges.items()
    }
    wpath = str(tmp_path / "w_v4i8.bin")
    export_native_weights_int8(folded, act_qp, wpath, integer_pc=True)
    eng8 = NativeEngine(wpath, quant="v48")
    eng16 = NativeEngine(wpath, quant="v4")
    spec = rng.standard_normal((1, 257, 4, 2)).astype(np.float32) * 0.3
    for t in range(4):
        y8 = eng8.step(spec[0, :, t, :])
        y16 = eng16.step(spec[0, :, t, :])
        assert np.array_equal(y8, y16), t
