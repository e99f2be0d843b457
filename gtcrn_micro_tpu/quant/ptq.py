"""Post-training quantization: range observation -> int8 fake-quant model.

Pipeline (reference equivalent: onnx2tf full-integer PTQ with a calibration
set, scripts/onnx2tf.sh + utils/calibration_data.py):

1. ``observe_ranges(model, params, calib_specs)`` -- jit-compiled forward
   passes with a ``RangeObserver`` hooked into every conv/matmul boundary
   (nn/core.py ctx.quant); per-path min/max merged across batches on host.
2. ``make_quantizer(params, ranges)`` -- freeze activation qparams
   (per-tensor asymmetric) and weight qparams (per-channel symmetric).
3. ``quantized_apply / quantized_step`` -- same model graph with int8
   fake-quant at every boundary: the TPU-native analog of the int8 .tflite
   artifact.  QAT = run the trainer with ``ctx.quant`` set to the same
   quantizer (straight-through gradients).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.nn.core import Ctx
from gtcrn_micro_tpu.quant.fake_quant import (
    QParams,
    act_qparams,
    fake_quant,
    weight_qparams,
)


class RangeObserver:
    """ctx.quant hook that records per-path activation ranges.

    Ranges are percentile-clipped (default p99.99, mirroring the reference's
    input calibration ``2 * p99.99 * 1.06``, utils/calibration_data.py:97-98):
    hard min/max lets one outlier blow up the scale and destroy int8
    resolution for the bulk of the distribution.
    """

    def __init__(self, percentile: float = 99.99, per_channel: bool = False):
        self.percentile = percentile
        self.per_channel = per_channel
        self.ranges: dict[str, tuple[jax.Array, jax.Array]] = {}

    def act(self, ctx: Ctx, leaf: str, x):
        path = ctx.path(leaf)
        p = self.percentile
        # per_channel: one [lo, hi] per minor-axis lane (the NHWC channel
        # axis at conv boundaries) -- scales stay a vector broadcast over
        # the leading axes, so fake_quant needs no changes
        axis = tuple(range(x.ndim - 1)) if self.per_channel else None
        self.ranges[path] = (
            jnp.percentile(x, 100.0 - p, axis=axis),
            jnp.percentile(x, p, axis=axis),
        )
        return x

    def weight(self, ctx: Ctx, leaf: str, w, channel_axis: int):
        return w


class FakeQuantizer:
    """ctx.quant hook applying int8 fake-quant with frozen qparams.

    Weight qparams are computed on the fly from the current weights (so QAT
    tracks the moving weights); activation qparams come from calibration.
    """

    def __init__(self, act_qp: dict[str, QParams]):
        self.act_qp = act_qp

    def act(self, ctx: Ctx, leaf: str, x):
        qp = self.act_qp.get(ctx.path(leaf))
        if qp is None:
            raise KeyError(f"no activation qparams for {ctx.path(leaf)}")
        return fake_quant(x, qp)

    def weight(self, ctx: Ctx, leaf: str, w, channel_axis: int):
        return fake_quant(w, weight_qparams(w, channel_axis))


def _in_channel_axis(leaf: str, w, lanes: int) -> int:
    """Axis of ``w`` that contracts against the boundary's activation lanes
    (the NHWC channel axis), in the MODEL layout.

    - 4-D HWIO convs: axis 2 (I) for mixing convs; axis 3 (O) for depthwise
      (I == 1, each output channel reads its own input lane).
    - 2-D pointwise (in, out): axis 0.
    - TRA ``depth_w`` (k, C): depthwise over the channel -> axis 1.
    """
    if w.ndim == 4:
        if w.shape[2] == lanes and w.shape[2] > 1:
            return 2
        if w.shape[2] == 1 and w.shape[3] == lanes:
            return 3
    elif w.ndim == 2:
        if leaf == "depth_w" and w.shape[1] == lanes:
            return 1
        if leaf != "depth_w" and w.shape[0] == lanes:
            return 0
    raise ValueError(f"cannot map {lanes} act lanes onto {leaf} {w.shape}")


class FakeQuantizerV4(FakeQuantizer):
    """Integer-MAC per-channel simulation (GTM8 v4).

    Per-LANE activation scales on a MIXING conv input cannot ride an integer
    MAC directly (the scale varies inside the contraction).  The standard
    fix -- what the v4 native engine executes -- is to fold the lane scales
    into the weights: quantize ``w_folded = w * s_in`` per out-channel, then
    the integer dot ``sum_i W[o,i] * (q_i - z_i)`` needs only ONE float
    rescale (the folded weight scale) per output.  The simulated effective
    weight is therefore ``dequant(quant(w * s_in)) / s_in`` -- weight
    rounding happens on the act-scale-folded tensor, which is the only
    numerical difference vs the v3 fake-quant sim.
    """

    def __init__(self, act_qp: dict[str, QParams]):
        super().__init__(act_qp)
        self._last_act: str | None = None

    def act(self, ctx: Ctx, leaf: str, x):
        # every weight hook fires immediately after its boundary's act hook
        # (nn/core.py call sites), so the pairing is positional
        self._last_act = ctx.path(leaf)
        return super().act(ctx, leaf, x)

    def weight(self, ctx: Ctx, leaf: str, w, channel_axis: int):
        qp = self.act_qp[self._last_act]
        s = jnp.ravel(jnp.asarray(qp.scale, jnp.float32))
        if s.size == 1:
            sf = s[0]
        else:
            ax = _in_channel_axis(leaf, w, int(s.size))
            shape = [1] * w.ndim
            shape[ax] = s.size
            sf = s.reshape(shape)
        wf = w * sf
        return fake_quant(wf, weight_qparams(wf, channel_axis)) / sf


@dataclasses.dataclass
class QuantizedModel:
    """int8-simulated model: offline ``apply`` and streaming ``step``.

    Holds the fp32 params + frozen activation qparams; the graph is the SAME
    single definition (models/gtcrn_micro.py) -- offline, streaming and
    quantized paths cannot diverge (unlike the reference's
    PyTorch/ONNX/TFLite triplet, utils/output_tests.py).
    """

    model: Any
    act_qp: dict[str, QParams]
    # v4: weight rounding on act-scale-folded tensors (FakeQuantizerV4),
    # matching the full-integer per-channel native engine (GTM8 v4)
    v4: bool = False

    def _quantizer(self):
        cls = FakeQuantizerV4 if self.v4 else FakeQuantizer
        return cls(self.act_qp)

    def apply(self, params, spec):
        ctx = Ctx()
        ctx.quant = self._quantizer()
        return self.model._forward(params, spec, ctx)

    def init_state(self, batch: int):
        return self.model.init_state(batch)

    def step(self, params, state, spec):
        ring = "step" in state
        ctx = Ctx(state=state, ring=ring, step=state.get("step"))
        ctx.quant = self._quantizer()
        out = self.model._forward(params, spec, ctx)
        new_state = ctx.new_state
        if ring:
            new_state["step"] = (state["step"] + 1) & 15
        return out, new_state


def observe_ranges(model, params, calib_specs, batch_size: int = 8,
                   percentile: float = 99.99, per_channel: bool = False):
    """Run calibration specs through the model, returning merged per-path
    activation ranges.  ``calib_specs``: (N, F, T, 2) array.  With
    ``per_channel`` each path's (lo, hi) are minor-axis vectors instead of
    scalars (see RangeObserver)."""
    import numpy as np

    @jax.jit
    def one_batch(spec):
        ctx = Ctx()
        obs = RangeObserver(percentile, per_channel)
        ctx.quant = obs
        model._forward(params, spec, ctx)
        return obs.ranges

    merged: dict[str, tuple] = {}
    for i in range(0, calib_specs.shape[0], batch_size):
        ranges = jax.device_get(one_batch(calib_specs[i : i + batch_size]))
        for path, (lo, hi) in ranges.items():
            if path in merged:
                mlo, mhi = merged[path]
                merged[path] = (np.minimum(mlo, lo), np.maximum(mhi, hi))
            else:
                merged[path] = (lo, hi)
    if per_channel:
        return merged
    return {p: (float(lo), float(hi)) for p, (lo, hi) in merged.items()}


def make_quantized_model(model, params, calib_specs, batch_size: int = 8,
                         percentile: float = 99.99, act_bits: int = 8,
                         per_channel_acts: bool = False, v4: bool = False):
    """One-shot PTQ: observe ranges, freeze qparams, return QuantizedModel.

    ``act_bits=8`` -> full-int8 (TFLite default mode, the reference artifact's
    format); ``act_bits=16`` -> 16x8 mode (int16 activations, int8 weights),
    which preserves the high-dynamic-range TRA-gate/decoder activations.
    ``per_channel_acts``: minor-axis activation scales (beyond TFLite --
    scripts/act_grid_perchannel.py measures what this buys).
    ``v4``: simulate the full-integer per-channel deployment (GTM8 v4):
    weight rounding on act-scale-folded tensors (FakeQuantizerV4).
    """
    ranges = observe_ranges(model, params, calib_specs, batch_size,
                            percentile, per_channel=per_channel_acts)
    act_qp = {
        path: act_qparams(jnp.asarray(lo, jnp.float32),
                          jnp.asarray(hi, jnp.float32), act_bits)
        for path, (lo, hi) in ranges.items()
    }
    return QuantizedModel(model=model, act_qp=act_qp, v4=v4)
