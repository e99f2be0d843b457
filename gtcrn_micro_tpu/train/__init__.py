from gtcrn_micro_tpu.train.loss import hybrid_loss, HybridLossConfig
from gtcrn_micro_tpu.train.scheduler import warmup_cosine_lr

__all__ = ["hybrid_loss", "HybridLossConfig", "warmup_cosine_lr"]
