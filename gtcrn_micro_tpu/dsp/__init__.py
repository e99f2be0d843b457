from gtcrn_micro_tpu.dsp.stft import (
    hann_window,
    sqrt_hann_window,
    stft,
    istft,
    StftConfig,
)
from gtcrn_micro_tpu.dsp.erb import erb_filter_banks, ErbBands
from gtcrn_micro_tpu.dsp.stream_dsp import (
    DspState,
    init_dsp_state,
    stft_chunk,
    istft_chunk,
    make_audio_step,
    make_audio_scan,
)

__all__ = [
    "hann_window",
    "sqrt_hann_window",
    "stft",
    "istft",
    "StftConfig",
    "erb_filter_banks",
    "ErbBands",
    "DspState",
    "init_dsp_state",
    "stft_chunk",
    "istft_chunk",
    "make_audio_step",
    "make_audio_scan",
]
