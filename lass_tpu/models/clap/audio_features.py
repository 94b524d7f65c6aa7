"""Audio feature preparation for CLAP audio queries.

Behavioral spec: reference models/CLAP/training/data.py get_audio_features
(:451-563): clips shorter than max_len are filled ('repeatpad': tile whole
copies then zero-pad; 'pad': zero-pad; 'repeat': tile+crop), clips longer
are truncated ('rand_trunc': random crop; 'fusion': 3 random mel chunks +
resized global mel — only meaningful with a fusion-enabled HTSAT, which
LASS disables, clap_encoder.py:22).

For the LASS audio-query path the input is exactly 10 s at 48 kHz
(resampled from 32 kHz, clap_encoder.py:59-61), i.e. len == max_len and
this is an identity. Static shapes: the batch path takes (B, L) with one
shared fill strategy.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def prepare_audio(
    waveform: np.ndarray,
    max_len: int = 480000,
    data_filling: str = "repeatpad",
    data_truncating: str = "rand_trunc",
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """(L,) -> (max_len,). Host-side, variable input length."""
    rng = rng or np.random.default_rng()
    n = len(waveform)
    if n > max_len:
        if data_truncating in ("rand_trunc", "fusion"):
            # non-fusion models handle long audio by random crop (the
            # 'fusion' mel-stack needs a fusion-enabled encoder)
            start = int(rng.integers(0, n - max_len + 1))
            return np.asarray(waveform[start:start + max_len],
                              dtype=np.float32)
        raise NotImplementedError(data_truncating)
    if n == max_len:
        return np.asarray(waveform, dtype=np.float32)
    out = np.zeros(max_len, np.float32)
    if data_filling == "repeatpad":
        reps = max_len // n
        out[:reps * n] = np.tile(waveform, reps)
    elif data_filling == "pad":
        out[:n] = waveform
    elif data_filling == "repeat":
        reps = -(-max_len // n)
        out[:] = np.tile(waveform, reps)[:max_len]
    else:
        raise NotImplementedError(data_filling)
    return out


def prepare_audio_fusion(
    waveform: np.ndarray,
    max_len: int = 480000,
    data_filling: str = "repeatpad",
    mel_cfg=None,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, bool, np.ndarray]:
    """(L,) -> (mel_fusion (4, chunk_frames, n_mels), longer, audio
    (max_len,)) — the 'fusion' branch of get_audio_features
    (training/data.py:467-563): long clips yield 3 random mel chunks + the
    resized global mel and a random audio crop; short/equal clips are
    filled and their whole mel is stacked 4x with longer=False."""
    from lass_tpu.dsp.mel import LogMelConfig, log_mel_spectrogram_np
    from lass_tpu.models.clap.fusion import build_mel_fusion

    mel_cfg = mel_cfg or LogMelConfig()
    rng = rng or np.random.default_rng()
    waveform = np.asarray(waveform, np.float32)
    n = len(waveform)
    chunk_frames = max_len // mel_cfg.hop_length + 1
    if n > max_len:
        mel = log_mel_spectrogram_np(waveform, mel_cfg)
        mel_fusion, longer = build_mel_fusion(mel, chunk_frames, rng)
        start = int(rng.integers(0, n - max_len + 1))
        audio = waveform[start:start + max_len]
    else:
        audio = prepare_audio(waveform, max_len, data_filling)
        mel = log_mel_spectrogram_np(audio, mel_cfg)
        mel_fusion = np.stack([mel, mel, mel, mel]).astype(np.float32)
        longer = False
    return mel_fusion, longer, audio


def prepare_audio_batch(waveforms: np.ndarray, max_len: int = 480000,
                        data_filling: str = "repeatpad") -> np.ndarray:
    """(B, L) fixed-length batch -> (B, max_len)."""
    b, n = waveforms.shape
    if n == max_len:
        return np.asarray(waveforms, np.float32)
    if n > max_len:
        return np.asarray(waveforms[:, :max_len], np.float32)
    return np.stack([
        prepare_audio(w, max_len, data_filling) for w in waveforms])
