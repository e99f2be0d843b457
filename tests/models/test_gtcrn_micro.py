"""Model-level golden properties (reference test strategy, SURVEY.md §4):

1. causality  -- two signals sharing a prefix produce identical outputs over
   the prefix and different ones after divergence
   (pattern: reference tests/models/test_gtcrn_micro.py:6-39)
2. streaming == offline -- frame-by-frame scan equals the offline pass
   (pattern: reference tests/streaming/conversion/test_convolution.py)
3. checkpoint parity -- >60 dB SNR vs the reference PyTorch model running the
   shipped best_model_dns3.tar (the round-1 gate from SURVEY.md §7.2)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.dsp import sqrt_hann_window, stft, istft
from gtcrn_micro_tpu.models import GTCRNMicro

CKPT = "/root/reference/gtcrn_micro/ckpts/best_model_dns3.tar"


@pytest.fixture(scope="module")
def model():
    return GTCRNMicro()


@pytest.fixture(scope="module")
def params(model):
    return model.init(jax.random.PRNGKey(0))


def test_forward_shapes(model, params):
    spec = jax.random.normal(jax.random.PRNGKey(1), (2, 257, 7, 2))
    out = model.apply_jit(params, spec)
    assert out.shape == (2, 257, 7, 2)


def test_causality(model, params):
    """Architecture-level causality on an untrained model."""
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1, 8000)).astype(np.float32)
    b = rng.standard_normal((1, 8000)).astype(np.float32)
    c = rng.standard_normal((1, 8000)).astype(np.float32)
    x1 = np.concatenate([a, b], axis=1)
    x2 = np.concatenate([a, c], axis=1)

    w = sqrt_hann_window(512)
    s1 = stft(jnp.asarray(x1), w)
    s2 = stft(jnp.asarray(x2), w)
    y1 = istft(model.apply_jit(params, s1), w)[0]
    y2 = istft(model.apply_jit(params, s2), w)[0]

    prefix = 8000 - 256 * 2
    res1 = np.abs(np.asarray(y1[:prefix] - y2[:prefix])).max()
    res2 = np.abs(np.asarray(y1[8000:] - y2[8000:])).max()
    assert res1 == 0.0
    assert res2 > 0.0


def test_streaming_equals_offline(model, params):
    spec = jax.random.normal(jax.random.PRNGKey(2), (2, 257, 12, 2)) * 0.5
    offline = model.apply_jit(params, spec)
    state = model.init_state(2)
    streamed, _ = model.scan_frames_jit(params, state, spec)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(offline), atol=1e-5
    )


def test_streaming_chunked_equals_offline(model, params):
    """Chunk streaming (T_chunk=3) must also equal offline -- a capability the
    reference's frame-only streaming model doesn't have."""
    spec = jax.random.normal(jax.random.PRNGKey(3), (1, 257, 12, 2)) * 0.5
    offline = model.apply_jit(params, spec)
    state = model.init_state(1, ring=False)  # chunked steps need shift caches
    outs = []
    for t0 in range(0, 12, 3):
        y, state = model.step_jit(params, state, spec[:, :, t0 : t0 + 3, :])
        outs.append(np.asarray(y))
    streamed = np.concatenate(outs, axis=2)
    np.testing.assert_allclose(streamed, np.asarray(offline), atol=1e-5)


def test_state_shapes_match_reference_inventory(model):
    """Canonical per-stream state (SURVEY.md §2.2 / reference :617-623)."""
    state = model.init_state(4, ring=False)
    conv = [k for k in state if k.endswith("depth_conv/cache")]
    tra = [k for k in state if k.endswith("tra/cache")]
    tcn = [k for k in state if "/conv2/cache" in k]
    assert len(conv) == 6 and all(state[k].shape == (4, 2, 33, 16) for k in conv)
    assert len(tra) == 6 and all(state[k].shape == (4, 2, 8) for k in tra)
    assert len(tcn) == 8
    dils = sorted(state[k].shape[1] for k in tcn)
    assert dils == [2, 2, 4, 4, 8, 8, 16, 16]


def test_param_count_matches_reference(model, params):
    n_trainable = 0
    for path, v in jax.tree_util.tree_leaves_with_path(params):
        p = jax.tree_util.keystr(path)
        if "erb" in p or "running" in p:
            continue
        n_trainable += int(np.prod(v.shape))
    assert n_trainable == 19014  # 19.01k (reference gtcrn_micro/README.md:25)


@pytest.mark.parametrize("n_samples", [16000])
def test_checkpoint_parity_vs_reference(n_samples):
    """>60 dB SNR vs the reference PyTorch model on the shipped checkpoint."""
    torch = pytest.importorskip("torch")
    import os
    import sys

    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoint unavailable")
    sys.path.insert(0, "/root/reference")
    try:
        from gtcrn_micro.models.gtcrn_micro import GTCRNMicro as TorchModel
    finally:
        sys.path.pop(0)

    from gtcrn_micro_tpu.io import import_reference_checkpoint

    tm = TorchModel().eval()
    ckpt = torch.load(CKPT, map_location="cpu", weights_only=False)
    tm.load_state_dict(ckpt["model"])

    rng = np.random.default_rng(0)
    x = rng.standard_normal(n_samples).astype(np.float32) * 0.1
    spec_t = torch.stft(
        torch.from_numpy(x),
        512,
        256,
        512,
        torch.hann_window(512).pow(0.5),
        return_complex=False,
    )[None]
    with torch.no_grad():
        ref = tm(spec_t).numpy()

    model = GTCRNMicro()
    params = import_reference_checkpoint(CKPT)
    out = np.asarray(model.apply_jit(params, jnp.asarray(spec_t.numpy())))

    snr = 10 * np.log10(np.mean(ref**2) / np.mean((out - ref) ** 2))
    assert snr > 60.0, f"checkpoint parity SNR {snr:.1f} dB < 60 dB"


def test_ring_streaming_equals_shift_streaming(model, params):
    """Ring-buffer serving path (O(1) cache writes) == shift-cache oracle,
    across a full ring wrap (16 frames)."""
    spec = jax.random.normal(jax.random.PRNGKey(7), (2, 257, 20, 2)) * 0.5
    s_ring = model.init_state(2, ring=True)
    s_shift = model.init_state(2, ring=False)
    assert "step" in s_ring and "step" not in s_shift
    ring_out, shift_out = [], []
    for t in range(20):
        y1, s_ring = model.step_jit(params, s_ring, spec[:, :, t : t + 1])
        y2, s_shift = model.step_jit(params, s_shift, spec[:, :, t : t + 1])
        ring_out.append(np.asarray(y1))
        shift_out.append(np.asarray(y2))
    np.testing.assert_allclose(
        np.concatenate(ring_out, 2), np.concatenate(shift_out, 2), atol=1e-5
    )


def test_psum_streaming_equals_offline(model, params):
    """l2_psum serving state (direct-form-II-transposed L==2 caches) ==
    offline, across a full mod-16 counter wrap.  Also pins the state
    inventory: all 14 L==2 caches (6 GTConv convs, 2 d=1 TCN convs, 6 TRA
    energy convs) become partial-output pairs; the L>=4 rings stay rings."""
    spec = jax.random.normal(jax.random.PRNGKey(13), (2, 257, 20, 2)) * 0.5
    offline = model.apply_jit(params, spec)
    state = model.init_state(2, ring=True, l2_psum=True)
    psum_a = [k for k in state if k.endswith("psum_a")]
    rings = [k for k in state if k.endswith("/ring")]
    assert len(psum_a) == 14
    assert len(rings) == 6  # d in {2,4,8} x 2 GTCNs keep the ring form
    outs = []
    for t in range(20):
        y, state = model.step_jit(params, state, spec[:, :, t : t + 1])
        outs.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(outs, 2), np.asarray(offline), atol=1e-5
    )


@pytest.mark.parametrize("chunk", [2, 4, 16])
def test_chunked_psum_streaming_equals_offline(model, params, chunk):
    """T-frame chunks through the psum state: the cross-boundary correction
    terms (first two frames of each chunk) must reproduce offline exactly,
    including across counter wraps."""
    n = 32
    spec = jax.random.normal(jax.random.PRNGKey(15), (2, 257, n, 2)) * 0.5
    offline = model.apply_jit(params, spec)
    state = model.init_state(2, ring=True, l2_psum=True)
    outs = []
    for t0 in range(0, n, chunk):
        y, state = model.step_jit(
            params, state, spec[:, :, t0 : t0 + chunk, :]
        )
        outs.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(outs, axis=2), np.asarray(offline), atol=1e-5
    )


def test_fp8_ring_storage_runs_and_degrades_gracefully(model, params):
    """store_dtype=fp8_e4m3: ring caches stored narrow, cast on tap read.
    The mode must (a) actually store fp8, (b) stay finite over a counter
    wrap, (c) track the fp32 stream with bounded error -- the quality cost
    compounds through the recurrence, so this is a deployment OPTION, not
    the serving default (PERF.md r4 measures the speed side)."""
    spec = jax.random.normal(jax.random.PRNGKey(17), (1, 257, 20, 2)) * 0.5
    offline = np.asarray(model.apply_jit(params, spec))
    state = model.init_state(1, ring=True,
                             store_dtype=jnp.float8_e4m3fn)
    rings = [k for k in state if k.endswith("/ring")]
    assert rings and all(state[k].dtype == jnp.float8_e4m3fn for k in rings)
    outs = []
    for t in range(20):
        y, state = model.step_jit(params, state, spec[:, :, t : t + 1])
        outs.append(np.asarray(y))
    got = np.concatenate(outs, 2)
    assert np.isfinite(got).all()
    err = got - offline
    snr = 10 * np.log10(np.sum(offline**2) / max(np.sum(err**2), 1e-20))
    assert snr > 10.0, f"fp8 ring storage SNR {snr:.1f} dB"


def test_composed_psum_fp8_state(model, params):
    """l2_psum + store_dtype=fp8 COMPOSED (the r4 plateau-attack config,
    bench phase 2b/2c): the 14 L==2 caches become compute-dtype partial
    pairs (fresh values each step -- narrowing them would compound error
    in the recurrence), the 6 L>=4 rings store fp8, and the stream stays
    finite and tracks fp32 across a counter wrap."""
    spec = jax.random.normal(jax.random.PRNGKey(19), (1, 257, 20, 2)) * 0.5
    offline = np.asarray(model.apply_jit(params, spec))
    state = model.init_state(1, ring=True, l2_psum=True,
                             store_dtype=jnp.float8_e4m3fn)
    rings = [k for k in state if k.endswith("/ring")]
    psums = [k for k in state if k.endswith("psum_a")]
    assert len(psums) == 14 and len(rings) == 6
    assert all(state[k].dtype == jnp.float8_e4m3fn for k in rings)
    assert all(state[k].dtype == jnp.float32 for k in psums)
    outs = []
    for t in range(20):
        y, state = model.step_jit(params, state, spec[:, :, t : t + 1])
        outs.append(np.asarray(y))
    got = np.concatenate(outs, 2)
    assert np.isfinite(got).all()
    err = got - offline
    snr = 10 * np.log10(np.sum(offline**2) / max(np.sum(err**2), 1e-20))
    assert snr > 10.0, f"composed psum+fp8 SNR {snr:.1f} dB"


def test_bn_folding_equivalence(model, params):
    """fold_bn_params must be numerically equivalent (serving transform)."""
    from gtcrn_micro_tpu.models.folding import fold_bn_params

    folded = fold_bn_params(params)
    spec = jax.random.normal(jax.random.PRNGKey(9), (1, 257, 6, 2)) * 0.5
    ref = model.apply(params, spec)
    out = model.apply(folded, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("chunk", [2, 4, 8, 16])
def test_chunked_ring_streaming_equals_offline(model, params, chunk):
    """Multi-frame ring serving (T-frame chunks per dispatch, VERDICT r2 #1):
    a T-chunk ring step must equal the offline pass exactly, including across
    step-counter wraps (32 frames = 2 full mod-16 wraps)."""
    n = 32
    spec = jax.random.normal(jax.random.PRNGKey(11), (2, 257, n, 2)) * 0.5
    offline = model.apply_jit(params, spec)
    state = model.init_state(2, ring=True)
    outs = []
    for t0 in range(0, n, chunk):
        y, state = model.step_jit(
            params, state, spec[:, :, t0 : t0 + chunk, :]
        )
        outs.append(np.asarray(y))
    streamed = np.concatenate(outs, axis=2)
    np.testing.assert_allclose(streamed, np.asarray(offline), atol=1e-5)


def test_ring_rejects_non_power_of_two_chunk(model, params):
    state = model.init_state(1, ring=True)
    spec = jnp.zeros((1, 257, 3, 2))
    with pytest.raises(ValueError, match="power-of-two"):
        model.step(params, state, spec)
