from gtcrn_micro_tpu.quant.fake_quant import (
    QParams,
    act_qparams,
    dequantize,
    fake_quant,
    quantize,
    saturation_fraction,
    weight_qparams,
)
from gtcrn_micro_tpu.quant.adaround import (
    AdaRoundQuantizer,
    adaround_optimize,
    bias_refine,
    load_act_qp,
)
from gtcrn_micro_tpu.quant.mixed import (
    compose_act_qp,
    greedy_lift,
)
from gtcrn_micro_tpu.quant.ptq import (
    FakeQuantizer,
    QuantizedModel,
    RangeObserver,
    make_quantized_model,
    observe_ranges,
)

__all__ = [
    "QParams", "act_qparams", "dequantize", "fake_quant", "quantize",
    "saturation_fraction", "weight_qparams", "FakeQuantizer",
    "QuantizedModel", "RangeObserver", "make_quantized_model",
    "observe_ranges", "AdaRoundQuantizer", "adaround_optimize",
    "bias_refine", "load_act_qp", "compose_act_qp", "greedy_lift",
]
