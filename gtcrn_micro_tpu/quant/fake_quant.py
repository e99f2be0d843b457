"""Int8 fake-quantization primitives (PTQ simulation + QAT).

TFLite-compatible affine quantization (the reference's deployment format,
scripts/onnx2tf.sh:50-64 full-integer int8):

- activations: per-tensor asymmetric int8, ``q = round(x/s) + z``
- weights: per-channel symmetric int8 (``-qt per-channel``), zero point 0

``fake_quant`` is a straight-through estimator: forward rounds through the
int8 grid, backward passes gradients unchanged -- so the SAME functions serve
post-training simulation and quantization-aware training.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

INT8_MIN, INT8_MAX = -128, 127
INT16_MIN, INT16_MAX = -32768, 32767


@dataclasses.dataclass(frozen=True)
class QParams:
    """Affine quantization parameters: x ~ (q - zero) * scale."""

    scale: jax.Array  # scalar or per-channel vector
    zero: jax.Array  # int zero point (0 for symmetric)
    qmin: int = INT8_MIN
    qmax: int = INT8_MAX

    def tree_flatten(self):
        return (self.scale, self.zero), (self.qmin, self.qmax)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])


jax.tree_util.register_pytree_node(
    QParams, QParams.tree_flatten, QParams.tree_unflatten
)


def act_qparams(lo: jax.Array, hi: jax.Array, bits: int = 8) -> QParams:
    """Per-tensor asymmetric int params from an observed [lo, hi] range.

    ``bits`` = 8 (full-int8, TFLite default mode) or 16 (TFLite 16x8 mode:
    int16 activations, int8 weights -- the standard fix when per-tensor int8
    wrecks high-dynamic-range activations).  The range is nudged to include 0
    (real 0 must be exactly representable so zero padding stays exact).
    """
    qmin, qmax = (INT8_MIN, INT8_MAX) if bits == 8 else (INT16_MIN, INT16_MAX)
    lo = jnp.minimum(lo, 0.0)
    hi = jnp.maximum(hi, 0.0)
    scale = (hi - lo) / (qmax - qmin)
    scale = jnp.maximum(scale, 1e-12)
    zero = jnp.round(qmin - lo / scale)
    return QParams(scale=scale, zero=jnp.clip(zero, qmin, qmax),
                   qmin=qmin, qmax=qmax)


def weight_qparams(w: jax.Array, channel_axis: int) -> QParams:
    """Per-channel symmetric int8 params (zero point 0)."""
    axes = tuple(i for i in range(w.ndim) if i != channel_axis)
    amax = jnp.max(jnp.abs(w), axis=axes)
    scale = jnp.maximum(amax / INT8_MAX, 1e-12)
    shape = [1] * w.ndim
    shape[channel_axis] = w.shape[channel_axis]
    return QParams(scale=scale.reshape(shape), zero=jnp.zeros(shape))


def quantize(x: jax.Array, qp: QParams) -> jax.Array:
    """Real quantization: float -> int values (int8 or int16 dtype)."""
    q = jnp.round(x / qp.scale) + qp.zero
    dtype = jnp.int8 if qp.qmax <= INT8_MAX else jnp.int16
    return jnp.clip(q, qp.qmin, qp.qmax).astype(dtype)


def dequantize(q: jax.Array, qp: QParams) -> jax.Array:
    return (q.astype(jnp.float32) - qp.zero) * qp.scale


def fake_quant(x: jax.Array, qp: QParams) -> jax.Array:
    """Round x through the integer grid; straight-through gradient."""
    q = jnp.clip(jnp.round(x / qp.scale) + qp.zero, qp.qmin, qp.qmax)
    y = (q - qp.zero) * qp.scale
    return x + jax.lax.stop_gradient(y - x)


def saturation_fraction(x: jax.Array, qp: QParams) -> jax.Array:
    """Fraction of values clipped by the int8 range (parity diagnostics,
    reference utils/output_tests.py:116-135)."""
    q = jnp.round(x / qp.scale) + qp.zero
    return jnp.mean((q < qp.qmin) | (q > qp.qmax))
