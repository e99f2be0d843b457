from gtcrn_micro_tpu.utils.config import load_config, Config

__all__ = ["load_config", "Config"]
