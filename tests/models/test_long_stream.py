"""Long-stream robustness (VERDICT r1 item 5).

A production stream runs millions of frames through wrapping ring buffers;
the round-1 suite only verified a single 16-slot wrap.  These tests pin:

1. 10k-frame streaming == offline (fp32 ~exact; bf16 bounded drift that does
   NOT grow with stream length),
2. the mod-16 step counter across >3 full wrap cycles,
3. chunked (shift-cache) streaming with random chunk-size restarts.

Reference pattern: gtcrn_micro/streaming/gtcrn_micro_stream.py:626-657 (the
reference's own frame-loop parity demo, which it never runs past one wav).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.models import GTCRNMicro

T_LONG = 10_000


@pytest.fixture(scope="module")
def model():
    return GTCRNMicro()


@pytest.fixture(scope="module")
def params(model):
    return model.init(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def long_spec():
    return jax.random.normal(jax.random.PRNGKey(11), (1, 257, T_LONG, 2)) * 0.5


@pytest.fixture(scope="module")
def offline_out(model, params, long_spec):
    return np.asarray(model.apply_jit(params, long_spec))


def test_long_stream_fp32_matches_offline(model, params, long_spec, offline_out):
    """10k frames through the ring path: fp32 streaming stays at float-eps
    distance from offline for the entire stream (625 ring wraps)."""
    state = model.init_state(1, ring=True)
    ys, final = model.scan_frames_jit(params, state, long_spec)
    assert int(final["step"]) == T_LONG % 16
    diff = np.abs(np.asarray(ys) - offline_out).max()
    assert diff < 1e-5, f"fp32 long-stream drift {diff:.2e}"


def test_long_stream_bf16_drift_is_bounded_and_flat(
    model, params, long_spec, offline_out
):
    """bf16 serving path over 10k frames: quantization error must be bounded
    (>35 dB SNR vs fp32 offline) and must NOT accumulate -- each 2k-frame
    segment's SNR stays within 3 dB of the first segment's."""
    pb = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    state = model.init_state(1, dtype=jnp.bfloat16, ring=True)
    ys, _ = model.scan_frames_jit(pb, state, long_spec.astype(jnp.bfloat16))
    y = np.asarray(ys.astype(jnp.float32))

    snrs = []
    for t0 in range(0, T_LONG, 2000):
        seg = slice(t0, t0 + 2000)
        err = offline_out[:, :, seg] - y[:, :, seg]
        snrs.append(
            10 * np.log10((offline_out[:, :, seg] ** 2).mean() / (err**2).mean())
        )
    assert min(snrs) > 35.0, f"bf16 segment SNRs {snrs}"
    assert max(snrs) - min(snrs) < 3.0, f"bf16 drift accumulates: {snrs}"


def test_ring_wrap_cycles_with_restarts(model, params):
    """>3 full mod-16 wrap cycles, processed as randomly-sized bursts of
    single-frame steps (simulating scheduler restarts between bursts):
    output must equal offline regardless of burst boundaries."""
    T = 52  # 3.25 wrap cycles
    spec = jax.random.normal(jax.random.PRNGKey(13), (2, 257, T, 2)) * 0.5
    offline = np.asarray(model.apply_jit(params, spec))

    rng = np.random.default_rng(0)
    state = model.init_state(2, ring=True)
    outs = []
    t = 0
    while t < T:
        burst = min(int(rng.integers(1, 9)), T - t)
        # a burst of frame steps; state round-trips to host between bursts
        state = jax.tree.map(jnp.asarray, jax.device_get(state))
        for _ in range(burst):
            y, state = model.step_jit(params, state, spec[:, :, t : t + 1])
            outs.append(np.asarray(y))
            t += 1
    assert int(state["step"]) == T % 16
    np.testing.assert_allclose(np.concatenate(outs, 2), offline, atol=1e-5)


def test_chunked_random_sizes_equals_offline(model, params):
    """Shift-cache path: random chunk sizes (1..7 frames) across >3 ring-
    length multiples must reproduce offline exactly at fp32 tolerance."""
    T = 50
    spec = jax.random.normal(jax.random.PRNGKey(17), (1, 257, T, 2)) * 0.5
    offline = np.asarray(model.apply_jit(params, spec))

    rng = np.random.default_rng(1)
    state = model.init_state(1, ring=False)
    outs = []
    t = 0
    while t < T:
        chunk = min(int(rng.integers(1, 8)), T - t)
        y, state = model.step(params, state, spec[:, :, t : t + chunk])
        outs.append(np.asarray(y))
        t += chunk
    np.testing.assert_allclose(np.concatenate(outs, 2), offline, atol=1e-5)
