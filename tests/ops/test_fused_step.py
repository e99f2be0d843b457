"""Fused-step oracle tests: the Pallas kernel (interpret mode on CPU) and
the layout-optimized XLA path must match the reference XLA ring model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.models import GTCRNMicro
from gtcrn_micro_tpu.ops.fused_step import (
    FusedGTCRNMicro,
    LayoutGTCRNMicro,
    pack_weights,
)

T = 20  # covers a full wrap of the largest (16-slot) ring


@pytest.fixture(scope="module")
def setup():
    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    spec = jnp.asarray(
        rng.standard_normal((16, 257, T, 2)).astype(np.float32) * 0.2
    )
    return model, params, spec


def _stream(stepper, params, state, spec):
    outs = []
    for t in range(spec.shape[2]):
        y, state = stepper(params, state, spec[:, :, t : t + 1])
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=2)


def test_fused_kernel_matches_xla_ring(setup):
    model, params, spec = setup
    fused = FusedGTCRNMicro(params, tile=8, interpret=True)  # 2 tiles
    ref = _stream(model.step, params, model.init_state(16, ring=True), spec)
    out = _stream(fused.step, None, fused.init_state(16), spec)
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_layout_xla_matches_ring(setup):
    model, params, spec = setup
    lm = LayoutGTCRNMicro(params)
    ref = _stream(model.step, params, model.init_state(16, ring=True), spec)
    out = _stream(lm.step, None, lm.init_state(16), spec)
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_pack_weights_count_and_dtypes(setup):
    _model, params, _spec = setup
    W = pack_weights(params, jnp.bfloat16)
    from gtcrn_micro_tpu.ops.fused_step import N_WEIGHTS

    assert len(W) == N_WEIGHTS
    assert all(w.dtype == jnp.bfloat16 for w in W)


def test_grid_fused_kernel_matches_xla_ring(setup):
    """v2 (grid + tap DMA) oracle, interpret mode."""
    from gtcrn_micro_tpu.ops.fused_grid import GridFusedGTCRNMicro

    model, params, spec = setup
    fused = GridFusedGTCRNMicro(params, tile=8, interpret=True)
    ref = _stream(model.step, params, model.init_state(16, ring=True),
                  spec[:, :, :6])
    out = _stream(fused.step, None, fused.init_state(16), spec[:, :, :6])
    np.testing.assert_allclose(out, ref, atol=2e-6)
