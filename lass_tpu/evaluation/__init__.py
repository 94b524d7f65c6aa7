from lass_tpu.evaluation.metrics import calculate_sdr, calculate_sisdr

__all__ = ["calculate_sdr", "calculate_sisdr"]
