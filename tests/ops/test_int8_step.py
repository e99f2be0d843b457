"""Int8 XLA serving step == the int8 fake-quant simulation.

The golden cross-path property (reference utils/output_tests.py pattern)
extended to the int8 serving path: ops/int8_step.Int8Serving executes the
same quantization scheme as quant/ptq.QuantizedModel on BN-folded params
(and as the native GTM8 engine), so outputs must agree to float
associativity across a full ring wrap."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.models import GTCRNMicro
from gtcrn_micro_tpu.models.folding import fold_bn_params
from gtcrn_micro_tpu.ops.int8_step import Int8Serving
from gtcrn_micro_tpu.quant.fake_quant import act_qparams
from gtcrn_micro_tpu.quant.ptq import QuantizedModel, observe_ranges


@pytest.fixture(scope="module")
def setup():
    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    folded = fold_bn_params(params)
    rng = np.random.default_rng(0)
    calib = jnp.asarray(
        rng.standard_normal((4, 257, 16, 2)).astype(np.float32) * 0.3
    )
    ranges = observe_ranges(model, folded, calib, batch_size=4)
    act_qp = {
        p: act_qparams(jnp.float32(lo), jnp.float32(hi), 8)
        for p, (lo, hi) in ranges.items()
    }
    return model, params, folded, act_qp


def test_int8_step_matches_fake_quant_sim(setup):
    model, params, folded, act_qp = setup
    serving = Int8Serving(model, params, act_qp, carry_dtype=jnp.float32)
    qm = QuantizedModel(model=model, act_qp=act_qp)

    rng = np.random.default_rng(1)
    B, T = 2, 20  # covers the full 16-slot ring wrap
    spec = rng.standard_normal((B, 257, T, 2)).astype(np.float32) * 0.3

    st8 = serving.init_state(B)
    st_sim = qm.init_state(B)
    step8 = jax.jit(serving.step)
    step_sim = jax.jit(qm.step)
    errs, mags, snrs = [], [], []
    for t in range(T):
        frame = jnp.asarray(spec[:, :, t : t + 1])
        y8, st8 = step8(st8, frame)
        ys, st_sim = step_sim(folded, st_sim, frame)
        errs.append(float(jnp.abs(y8 - ys).max()))
        mags.append(float(jnp.abs(ys).max()))
        num = float(jnp.sum(jnp.square(ys)))
        den = float(jnp.sum(jnp.square(y8 - ys)))
        snrs.append(10 * np.log10(num / den) if den > 0 else np.inf)
    # integer-exact accumulation vs the float simulation: bit-close except
    # for occasional single-quantum flips where a pre-quant value lands on a
    # rounding tie (1 ulp of float association decides the tie) -- so the
    # MEDIAN frame must match to float precision and the worst frame within
    # a few output-referred quanta
    errs = sorted(errs)
    assert errs[len(errs) // 2] < 1e-6, errs
    assert errs[-1] < 5e-3 * max(max(mags), 1.0), (errs, mags)
    # r2 verdict #7: the max-abs tolerance bounds how BIG a tie flip is but
    # not how MANY flip; per-frame SNR vs the sim bounds the count too
    assert min(snrs) > 50.0, snrs


def test_int8_zero_point_canary(setup):
    """Mutation canary (r2 verdict #7): perturbing ANY boundary's
    activation zero point by one quantum must be detected by the oracle --
    i.e. the sim-vs-int8 agreement genuinely pins every zero point."""
    import dataclasses

    model, params, folded, act_qp = setup

    rng = np.random.default_rng(2)
    spec = rng.standard_normal((1, 257, 8, 2)).astype(np.float32) * 0.3
    qm = QuantizedModel(model=model, act_qp=act_qp)

    def run(serving):
        st8 = serving.init_state(1)
        st_sim = qm.init_state(1)
        step8 = jax.jit(serving.step)
        step_sim = jax.jit(qm.step)
        worst = 0.0
        for t in range(8):
            frame = jnp.asarray(spec[:, :, t : t + 1])
            y8, st8 = step8(st8, frame)
            ys, st_sim = step_sim(folded, st_sim, frame)
            num = float(jnp.sum(jnp.square(ys)))
            den = float(jnp.sum(jnp.square(y8 - ys)))
            worst = max(worst, -10 * np.log10(num / den) if den > 0 else -np.inf)
        return -worst  # min per-frame SNR

    # pick 3 spread-out boundaries to mutate (full sweep would be slow)
    paths = sorted(act_qp)
    for path in (paths[0], paths[len(paths) // 2], paths[-1]):
        bad_qp = dict(act_qp)
        bad_qp[path] = dataclasses.replace(
            act_qp[path], zero=act_qp[path].zero + 1
        )
        snr = run(Int8Serving(model, params, bad_qp, carry_dtype=jnp.float32))
        assert snr < 50.0, (path, snr)


def test_int8_state_is_int8(setup):
    model, params, _folded, act_qp = setup
    serving = Int8Serving(model, params, act_qp)
    st = serving.init_state(3)
    rings = {k: v for k, v in st.items() if k != "step"}
    assert len(rings) == 20  # 6 dw + 6 tra + 8 tcn
    for k, v in rings.items():
        assert v.dtype == jnp.int8, k
    # rings hold the boundary zero points, not raw int8 zeros
    zp = serving.A["gtcn1/block0/conv2/in"].zero
    assert int(st["gtcn1/block0/conv2/in"][0, 0, 0, 0]) == zp
    # int8 state is half the bf16 state bytes (ERB-free inventory)
    int8_bytes = sum(v.size for v in rings.values())
    bf16_state = model.init_state(3, dtype=jnp.bfloat16)
    bf16_bytes = sum(
        2 * v.size for k, v in bf16_state.items() if k != "step"
    )
    assert int8_bytes * 2 == bf16_bytes


def test_int8_step_wraps_counter(setup):
    model, params, _folded, act_qp = setup
    serving = Int8Serving(model, params, act_qp)
    st = serving.init_state(1)
    step8 = jax.jit(serving.step)
    frame = jnp.zeros((1, 257, 1, 2), jnp.float32)
    for _ in range(17):
        _y, st = step8(st, frame)
    assert int(st["step"]) == 1  # 17 & 15
