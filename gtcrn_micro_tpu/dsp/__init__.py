from gtcrn_micro_tpu.dsp.stft import (
    hann_window,
    sqrt_hann_window,
    stft,
    istft,
    StftConfig,
)
from gtcrn_micro_tpu.dsp.erb import erb_filter_banks, ErbBands

__all__ = [
    "hann_window",
    "sqrt_hann_window",
    "stft",
    "istft",
    "StftConfig",
    "erb_filter_banks",
    "ErbBands",
]
