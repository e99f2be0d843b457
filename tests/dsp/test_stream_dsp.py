"""Online STFT/iSTFT state (dsp/stream_dsp.py) vs the offline transforms.

Golden properties:
- analysis: streaming frames == offline ``stft`` frames exactly (global
  frames >= 1 always; ALL frames when the stream opens with >= 257 zero
  samples, where the offline reflect pad is itself zeros)
- synthesis: streaming OLA == offline ``istft`` exactly on every emitted
  sample (the one-hop-delayed alignment)
- end-to-end: audio_step chain == offline STFT->model->iSTFT pipeline
- chunked (T in {1, 2, 4}) steps == per-hop steps
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
from gtcrn_micro_tpu.dsp.stream_dsp import (
    init_dsp_state,
    istft_chunk,
    make_audio_step,
    stft_chunk,
)

HOP = 256


@pytest.fixture(scope="module")
def window():
    return sqrt_hann_window(512)


def _signal(batch=2, hops=37, zero_prefix=0, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((batch, HOP * hops)).astype(np.float32)
    if zero_prefix:
        x[:, :zero_prefix] = 0.0
    return x


def _stream_stft(x, window, T=1):
    B, n = x.shape
    st = init_dsp_state(B)
    frames = []
    for t in range(0, n // HOP, T):
        f, st = stft_chunk(st, jnp.asarray(x[:, HOP * t : HOP * (t + T)]),
                           window)
        frames.append(np.asarray(f))
    return np.concatenate(frames, axis=2)


def _stream_istft(spec, window, T=1):
    B = spec.shape[0]
    st = init_dsp_state(B)
    outs = []
    for t in range(0, spec.shape[2], T):
        o, st = istft_chunk(st, spec[:, :, t : t + T], window)
        outs.append(np.asarray(o))
    return np.concatenate(outs, axis=-1)


@pytest.mark.parametrize("T", [1, 2, 4])
def test_stream_stft_matches_offline_interior(window, T):
    x = _signal(hops=36)
    off = np.asarray(stft(jnp.asarray(x), window))
    s = _stream_stft(x, window, T=T)
    # streaming frame t == offline frame t for t >= 1 (frame 0's reflect
    # pad needs x[256], unseen at stream open)
    np.testing.assert_array_equal(s[:, :, 1:], off[:, :, 1 : s.shape[2]])


@pytest.mark.parametrize("T", [1, 2, 4])
def test_stream_stft_exact_with_zero_prefix(window, T):
    x = _signal(hops=36, zero_prefix=257)
    off = np.asarray(stft(jnp.asarray(x), window))
    s = _stream_stft(x, window, T=T)
    np.testing.assert_array_equal(s, off[:, :, : s.shape[2]])


@pytest.mark.parametrize("T", [1, 2, 4])
def test_stream_istft_matches_offline(window, T):
    x = _signal(hops=36)
    spec = stft(jnp.asarray(x), window)  # any valid spec stream works
    off = np.asarray(istft(spec, window, length=x.shape[1]))
    s = _stream_istft(spec, window, T=T)
    # chunk emitted at step t covers offline samples 256(t-1):256t; the
    # step-0 chunk is the offline center-trim region, dropped by callers
    emitted = s[:, HOP:]
    n = min(emitted.shape[1], off.shape[1])
    np.testing.assert_array_equal(emitted[:, :n], off[:, :n])


@pytest.mark.parametrize("T", [1, 4])
def test_audio_step_matches_offline_pipeline(model_and_params, window, T):
    import jax

    model, params = model_and_params
    x = _signal(batch=1, hops=24, zero_prefix=257, seed=3)
    spec = stft(jnp.asarray(x), window)
    off = np.asarray(istft(model.apply_jit(params, spec), window,
                           length=x.shape[1]))

    step = jax.jit(make_audio_step(model, window), donate_argnums=(1, 2))
    dsp = init_dsp_state(1)
    mst = model.init_state(1)
    outs = []
    hops = x.shape[1] // HOP
    for t in range(0, hops - hops % T, T):
        o, dsp, mst = step(params, dsp, mst,
                           jnp.asarray(x[:, HOP * t : HOP * (t + T)]))
        outs.append(np.asarray(o))
    y = np.concatenate(outs, axis=-1)[:, HOP:]
    n = y.shape[1]
    np.testing.assert_allclose(y, off[:, :n], atol=5e-7)


@pytest.fixture(scope="module")
def model_and_params():
    import jax

    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro

    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_dsp_state_is_donatable_pytree(window):
    import jax

    st = init_dsp_state(3)
    leaves = jax.tree.leaves(st)
    assert len(leaves) == 2 and all(leaf.shape == (3, HOP) for leaf in leaves)

    @jax.jit
    def roundtrip(s, c):
        spec, s = stft_chunk(s, c, window)
        return istft_chunk(s, spec, window)

    out, st2 = roundtrip(st, jnp.ones((3, HOP)))
    assert out.shape == (3, HOP) and st2.in_buf.shape == (3, HOP)


# ---------------------------------------------------------------------------
# MXU-DFT serving path (windowed DFT as matmuls, envelope folded)
# ---------------------------------------------------------------------------


def test_mxu_dft_matches_fft_path_f32(window):
    from gtcrn_micro_tpu.dsp.stream_dsp import (
        _dft_mats,
        _istft_chunk_mxu,
        _stft_chunk_mxu,
    )

    x = _signal(hops=20, seed=5)
    B = x.shape[0]
    fwd, inv = _dft_mats(window)
    spec_full = stft(jnp.asarray(x), window)

    st_f, st_m = init_dsp_state(B), init_dsp_state(B)
    for t in range(20):
        c = jnp.asarray(x[:, HOP * t : HOP * (t + 1)])
        f_fft, st_f = stft_chunk(st_f, c, window)
        f_mxu, st_m = _stft_chunk_mxu(st_m, c, fwd)
        np.testing.assert_allclose(
            np.asarray(f_mxu), np.asarray(f_fft), atol=2e-4
        )

    st_f, st_m = init_dsp_state(B), init_dsp_state(B)
    for t in range(20):
        s = spec_full[:, :, t : t + 1]
        o_fft, st_f = istft_chunk(st_f, s, window)
        o_mxu, st_m = _istft_chunk_mxu(st_m, s, inv)
        np.testing.assert_allclose(
            np.asarray(o_mxu), np.asarray(o_fft), atol=2e-5
        )


def test_mxu_dft_bf16_roundtrip_snr(window):
    from gtcrn_micro_tpu.dsp.stream_dsp import (
        DspState,
        _dft_mats,
        _istft_chunk_mxu,
        _stft_chunk_mxu,
    )

    x = _signal(hops=24, seed=7)
    B = x.shape[0]
    fwd, inv = _dft_mats(window)
    st = DspState(
        in_buf=jnp.zeros((B, HOP), jnp.bfloat16),
        ola_buf=jnp.zeros((B, HOP), jnp.bfloat16),
    )
    outs = []
    for t in range(24):
        c = jnp.asarray(x[:, HOP * t : HOP * (t + 1)], jnp.bfloat16)
        f, st = _stft_chunk_mxu(st, c, fwd)
        o, st = _istft_chunk_mxu(st, f, inv)
        outs.append(np.asarray(o, np.float32))
    y = np.concatenate(outs, axis=-1)[:, HOP:]
    ref = x[:, : y.shape[1]]
    err = y - ref
    snr = 10 * np.log10((ref**2).sum() / (err**2).sum())
    # bf16 serving dtype: the DSP must stay above the bf16 MODEL path's
    # ~42-44 dB so it is never the quality bottleneck
    assert snr > 48.0, snr


def test_audio_step_mxu_tracks_fft(model_and_params, window):
    import jax

    model, params = model_and_params
    x = _signal(batch=1, hops=16, zero_prefix=257, seed=9)
    hops = x.shape[1] // HOP

    def run(dft):
        step = jax.jit(make_audio_step(model, window, dft=dft),
                       donate_argnums=(1, 2))
        dsp = init_dsp_state(1)
        mst = model.init_state(1)
        outs = []
        for t in range(hops):
            o, dsp, mst = step(params, dsp, mst,
                               jnp.asarray(x[:, HOP * t : HOP * (t + 1)]))
            outs.append(np.asarray(o))
        return np.concatenate(outs, axis=-1)[:, HOP:]

    y_fft, y_mxu = run("fft"), run("mxu")
    err = y_mxu - y_fft
    snr = 10 * np.log10(max((y_fft**2).sum(), 1e-20) /
                        max((err**2).sum(), 1e-20))
    assert snr > 55.0, snr


def test_make_audio_step_rejects_unknown_dft(model_and_params, window):
    model, _ = model_and_params
    with pytest.raises(ValueError):
        make_audio_step(model, window, dft="fht")


def test_audio_scan_matches_step_loop_and_offline(model_and_params, window):
    import jax

    from gtcrn_micro_tpu.dsp.stream_dsp import make_audio_scan

    model, params = model_and_params
    x = _signal(batch=2, hops=2000, zero_prefix=257, seed=11)

    scan = jax.jit(make_audio_scan(model, window), donate_argnums=(1, 2))
    dsp = init_dsp_state(2)
    mst = model.init_state(2)
    y, dsp, mst = scan(params, dsp, mst, jnp.asarray(x))
    y = np.asarray(y)[:, HOP:]

    # offline reference over the same (long) signal: 2000 frames = 125 ring
    # wraps of every temporal cache PLUS the carried DSP state -- the fused
    # audio pipeline must not drift
    spec = stft(jnp.asarray(x), window)
    off = np.asarray(istft(model.apply_jit(params, spec), window,
                           length=x.shape[1]))
    n = y.shape[1]
    seg = 250 * HOP
    for s in range(0, n - seg, seg):
        np.testing.assert_allclose(
            y[:, s : s + seg], off[:, s : s + seg], atol=1e-6,
            err_msg=f"segment starting at hop {s // HOP}",
        )
