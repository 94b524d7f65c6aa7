from lass_tpu.evaluation.metrics import (
    calculate_sdr,
    calculate_sisdr,
    calculate_segmentwise_sdr,
    get_mean_sdr_from_dict,
)

__all__ = ["calculate_sdr", "calculate_sisdr", "calculate_segmentwise_sdr",
           "get_mean_sdr_from_dict"]
