"""Mixed 16/8 activation precision: composition, greedy selection, and the
quantized-graph golden properties on a mixed act_qp.

Reference context: TFLite's 16x8 switch is all-or-nothing (reference
scripts/onnx2tf.sh); per-boundary mixing is this framework's extension
(quant/mixed.py + GTM8 v2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.models import GTCRNMicro
from gtcrn_micro_tpu.quant import compose_act_qp, greedy_lift, observe_ranges
from gtcrn_micro_tpu.quant.ptq import QuantizedModel


@pytest.fixture(scope="module")
def setup():
    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    calib = jnp.asarray(
        rng.standard_normal((4, 257, 16, 2)).astype(np.float32) * 0.3
    )
    ranges = observe_ranges(model, params, calib, batch_size=4)
    return model, params, ranges


def test_compose_act_qp_bits(setup):
    _model, _params, ranges = setup
    lifted = {"encoder/en2/pw1/in", "gtcn1/block0/pw1/in"}
    qp = compose_act_qp(ranges, lifted)
    assert len(qp) == 59
    for p, q in qp.items():
        want = 32767 if p in lifted else 127
        assert int(q.qmax) == want, p
        # real zero stays exactly representable at every boundary
        assert int(q.zero) == round(float(q.zero))


def test_compose_act_qp_keeps_learned_int8_scales(setup):
    """Unlifted boundaries keep the base (e.g. LSQ-learned) qparams object;
    lifted ones are rebuilt at int16 from the calibration ranges."""
    _model, _params, ranges = setup
    base = compose_act_qp(ranges, lifted=())
    import dataclasses

    tweaked = {
        p: dataclasses.replace(q, scale=q.scale * 1.5)
        for p, q in base.items()
    }
    lifted = {"decoder/de0/pw2/in"}
    qp = compose_act_qp(ranges, lifted, tweaked)
    for p in ranges:
        if p in lifted:
            assert int(qp[p].qmax) == 32767
        else:
            assert qp[p] is tweaked[p]


def test_greedy_lift_stub():
    """Greedy picks the highest-marginal-gain candidate each round and stops
    at the target."""
    gains = {"a": 3.0, "b": 10.0, "c": 1.0}

    def score(lifted):
        return 20.0 + sum(gains[p] for p in lifted)

    lifted, final, trail = greedy_lift(
        score, ["a", "b", "c"], target_db=32.0, max_lift=3, log=lambda s: None
    )
    assert trail[0][0] == "b"  # best marginal gain first
    assert lifted == {"b", "a"} and final == 33.0  # stops once >= target


def test_greedy_lift_stops_when_nothing_helps():
    def score(lifted):
        return 10.0 - len(lifted)  # every lift hurts

    lifted, final, trail = greedy_lift(
        score, ["a", "b"], target_db=50.0, max_lift=2, log=lambda s: None
    )
    assert lifted == set() and final == 10.0 and trail == []


def test_mixed_streaming_equals_offline(setup):
    """The golden streaming==offline property holds on a MIXED act_qp --
    the one-definition graph serves mixed precision like every other mode."""
    model, params, ranges = setup
    lifted = {"encoder/en2/pw1/in", "gtcn2/block3/pw3/in",
              "decoder/de4/conv/in"}
    qm = QuantizedModel(model=model, act_qp=compose_act_qp(ranges, lifted))
    rng = np.random.default_rng(1)
    spec = jnp.asarray(
        rng.standard_normal((1, 257, 8, 2)).astype(np.float32) * 0.3
    )
    offline = qm.apply(params, spec)
    state = qm.init_state(1)
    outs = []
    for t in range(spec.shape[2]):
        y, state = qm.step(params, state, spec[:, :, t : t + 1])
        outs.append(y)
    stream = jnp.concatenate(outs, axis=2)
    assert float(jnp.abs(stream - offline).max()) < 1e-5


def test_mixed_quality_between_int8_and_int16(setup):
    """Lifting boundaries moves the output monotonically toward the
    all-int16 result: mixed error <= int8 error on in-distribution input."""
    model, params, ranges = setup
    rng = np.random.default_rng(2)
    spec = jnp.asarray(
        rng.standard_normal((2, 257, 8, 2)).astype(np.float32) * 0.3
    )
    fp32 = model.apply(params, spec)

    def err(lifted):
        qm = QuantizedModel(model=model,
                            act_qp=compose_act_qp(ranges, lifted))
        return float(jnp.abs(qm.apply(params, spec) - fp32).mean())

    e8 = err(set())
    e16 = err(set(ranges))
    e_mixed = err(set(list(ranges)[:30]))
    assert e16 < e_mixed < e8
