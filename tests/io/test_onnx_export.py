"""ONNX emission round-trip: export through io/onnx_export, re-execute
through the in-repo ONNX interpreter (io/onnx.py), compare against JAX.

Mirrors the reference's export+parity story (stream_onnx.py opset-16 export
+ utils/output_tests.py cross-runtime MAE) with one addition the reference
lacks: the STREAMING step is exported too, and its cache threading is
verified frame by frame.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.io.onnx import OnnxModel
from gtcrn_micro_tpu.io.onnx_export import (
    export_model_onnx,
    export_onnx,
    export_stream_onnx,
)
from gtcrn_micro_tpu.models import GTCRNMicro


@pytest.fixture(scope="module")
def model_params():
    model = GTCRNMicro()
    return model, model.init(jax.random.PRNGKey(0))


def _roundtrip(fn, *args):
    blob = export_onnx(fn, args)
    om = OnnxModel(blob)
    got = om(*[np.asarray(a) for a in jax.tree.leaves(args)])
    want = jax.tree.leaves(fn(*args))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), atol=1e-6, rtol=1e-5)


def test_primitive_lowerings():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, 4)), jnp.float32)
    _roundtrip(lambda a: jnp.dot(a, w), x)
    _roundtrip(lambda a: jnp.tanh(a) + jax.nn.sigmoid(a) * a, x)
    _roundtrip(lambda a: jax.lax.rsqrt(jnp.abs(a) + 1.0), x)
    _roundtrip(lambda a: jnp.transpose(a, (2, 0, 1)).reshape(5, 6), x)
    _roundtrip(lambda a: jnp.concatenate([a, a * 2.0], axis=1)[:, 1:4], x)
    _roundtrip(lambda a: jnp.mean(a * a, axis=2), x)
    _roundtrip(lambda a: jnp.maximum(a, 0) + 0.25 * jnp.minimum(a, 0), x)
    _roundtrip(lambda a: jnp.broadcast_to(a[:, :1, :], (2, 3, 5)), x)
    _roundtrip(lambda a: jnp.where(a > 0, a, 2.0 * a), x)
    _roundtrip(lambda a: jnp.pad(a, ((0, 0), (1, 2), (0, 0))), x)


def test_dot_general_batched():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((4, 3, 5)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4, 5, 2)), jnp.float32)
    _roundtrip(lambda x, y: jnp.einsum("bik,bkj->bij", x, y), a, b)
    # contraction not on the last axis -> transpose/reshape canonicalisation
    _roundtrip(lambda x, y: jnp.einsum("bki,bkj->bij", x, y), a, a)


def test_conv_lowerings():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 3, 3, 5)), jnp.float32)  # HWIO

    def conv(pad, stride=(1, 1), lhs_dil=(1, 1), groups=1, rhs_dil=(1, 1)):
        wg = w if groups == 1 else jnp.asarray(
            rng.standard_normal((2, 3, 1, 3)), jnp.float32
        )
        return lambda a: jax.lax.conv_general_dilated(
            a, wg, stride, pad, lhs_dilation=lhs_dil, rhs_dilation=rhs_dil,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )

    _roundtrip(conv([(1, 0), (1, 1)]), x)                    # causal-ish pad
    _roundtrip(conv([(0, 0), (2, 2)], stride=(1, 2)), x)     # strided
    _roundtrip(conv([(1, 0), (1, 1)], rhs_dil=(2, 1)), x)    # dilated kernel
    _roundtrip(conv([(1, 0), (1, 1)], groups=3), x)          # depthwise
    _roundtrip(conv([(0, 0), (2, 2)], lhs_dil=(1, 2)), x)    # deconv (freq up)
    # negative pad lowers to an input Slice; mixed-sign padding on ONE dim is
    # avoided -- XLA's conv disagrees with lax.pad+valid-conv there (measured
    # on this jax build), and the model never emits it
    _roundtrip(conv([(-1, 0), (1, 1)]), x)


def test_offline_model_roundtrip(model_params):
    model, params = model_params
    blob = export_model_onnx(model, params, batch=1, frames=8)
    om = OnnxModel(blob)
    assert om.input_names == ["audio"]
    assert om.output_names == ["enhanced"]
    spec = np.random.default_rng(3).standard_normal((1, 257, 8, 2))
    spec = spec.astype(np.float32)
    got = om(spec)[0]
    want = np.asarray(model.apply(params, jnp.asarray(spec)))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_streaming_model_roundtrip(model_params):
    model, params = model_params
    blob = export_stream_onnx(model, params, batch=1)
    om = OnnxModel(blob)
    assert om.input_names[-1] == "audio"
    assert om.output_names[0] == "enhanced"

    state = model.init_state(1, ring=False)
    keys = sorted(state)
    assert om.input_names[:-1] == keys
    assert om.output_names[1:] == [f"{k}.out" for k in keys]

    rng = np.random.default_rng(4)
    spec = rng.standard_normal((1, 257, 6, 2)).astype(np.float32)
    caches = [np.asarray(state[k]) for k in keys]
    step = jax.jit(model.step)
    st = state
    for t in range(spec.shape[2]):
        frame = spec[:, :, t : t + 1, :]
        res = om(*caches, frame)
        caches = res[1:]
        want, st = step(params, st, jnp.asarray(frame))
        np.testing.assert_allclose(res[0], np.asarray(want), atol=2e-6)
    # final caches agree too -> the exported graph threads state correctly
    for c, k in zip(caches, keys):
        np.testing.assert_allclose(c, np.asarray(st[k]), atol=2e-6)


def test_export_file_parses(model_params, tmp_path):
    from gtcrn_micro_tpu.io.onnx import load_onnx

    model, params = model_params
    path = tmp_path / "m.onnx"
    path.write_bytes(export_model_onnx(model, params, batch=1, frames=4))
    g = load_onnx(str(path))
    assert g.inputs == ["audio"] and g.outputs == ["enhanced"]
    assert len(g.nodes) > 100 and len(g.initializers) > 50
