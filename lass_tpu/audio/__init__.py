from lass_tpu.audio.io import read_wav, write_wav
from lass_tpu.audio.resample import resample, resample_kernel

__all__ = ["read_wav", "write_wav", "resample", "resample_kernel"]
