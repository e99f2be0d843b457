from gtcrn_micro_tpu.eval.metrics import sdr_metric, sisnr_metric, stoi_metric

__all__ = ["sdr_metric", "sisnr_metric", "stoi_metric"]
