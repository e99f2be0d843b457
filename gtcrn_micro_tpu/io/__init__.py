from gtcrn_micro_tpu.io.torch_ckpt import import_reference_checkpoint
from gtcrn_micro_tpu.io.wav import read_wav, write_wav, resample

__all__ = ["import_reference_checkpoint", "read_wav", "write_wav", "resample"]
