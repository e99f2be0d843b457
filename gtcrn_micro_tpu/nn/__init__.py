from gtcrn_micro_tpu.nn.core import (
    Ctx,
    CausalConv2d,
    BatchNorm,
    PReLU,
    TRALite,
    prelu,
    sigmoid,
    tanh,
)
from gtcrn_micro_tpu.nn.blocks import (
    ConvBlock,
    GTConvBlock,
    TCN,
    GTCN,
    SFELite,
    Encoder,
    Decoder,
)

__all__ = [
    "Ctx",
    "CausalConv2d",
    "BatchNorm",
    "PReLU",
    "TRALite",
    "prelu",
    "sigmoid",
    "tanh",
    "ConvBlock",
    "GTConvBlock",
    "TCN",
    "GTCN",
    "SFELite",
    "Encoder",
    "Decoder",
]
