from lass_tpu.dsp.window import hann_window, pad_center
from lass_tpu.dsp.stft import (
    STFTConfig,
    stft,
    istft,
    magphase,
    spectrogram_phase,
    wav_to_spectrogram_complex,
    wav_to_spectrogram_phase,
)

__all__ = [
    "STFTConfig",
    "stft",
    "istft",
    "magphase",
    "spectrogram_phase",
    "wav_to_spectrogram_phase",
    "hann_window",
    "pad_center",
]
