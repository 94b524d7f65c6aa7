from lass_tpu.data.mixer import SegmentMixer

__all__ = ["SegmentMixer"]
