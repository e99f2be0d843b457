from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro, GTCRNMicroConfig
from gtcrn_micro_tpu.models.registry import get_model, register_model

__all__ = ["GTCRNMicro", "GTCRNMicroConfig", "get_model", "register_model"]
