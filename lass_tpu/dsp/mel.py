"""Log-mel front-end (librosa-compatible slaney mel filterbank).

Behavioral spec: the reference HTSAT/PANN front-end — torchlibrosa
Spectrogram (power=2) + LogmelFilterBank (librosa.filters.mel slaney scale
+ norm, ref=1.0, amin=1e-10, top_db=None) at 48 kHz / n_fft 1024 /
hop 480 / 64 mels / fmin 50 / fmax 14000 (htsat.py:864-902).

TPU design: |STFT|^2 via the fused windowed-DFT conv (lass_tpu.dsp.stft),
then ONE (F, n_mels) matmul for the filterbank. Filters are host-precomputed
numpy constants.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lass_tpu.dsp.stft import STFTConfig, stft


def hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney (htk=False) scale."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz)
                    / logstep,
                    mels)


def mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


@functools.lru_cache(maxsize=None)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float,
                   fmax: Optional[float]) -> np.ndarray:
    """(n_fft//2 + 1, n_mels) slaney-normalized triangular filters —
    matches librosa.filters.mel(htk=False, norm='slaney').T."""
    fmax = fmax if fmax is not None else sr / 2
    fftfreqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(np.array(fmin))[()],
                                    hz_to_mel(np.array(fmax))[()],
                                    n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class LogMelConfig:
    sample_rate: int = 48000
    n_fft: int = 1024
    hop_length: int = 480
    n_mels: int = 64
    fmin: float = 50.0
    fmax: Optional[float] = 14000.0
    ref: float = 1.0
    amin: float = 1e-10
    top_db: Optional[float] = None

    @property
    def stft_cfg(self) -> STFTConfig:
        return STFTConfig(n_fft=self.n_fft, hop_length=self.hop_length)


def log_mel_spectrogram_np(x: np.ndarray, cfg: LogMelConfig = LogMelConfig()
                           ) -> np.ndarray:
    """Host/numpy log-mel for variable-length feature building (the fusion
    mel stack is assembled host-side; per-length jit recompiles would cost
    minutes on axon). Same math as log_mel_spectrogram: center reflect pad,
    periodic hann, rfft power, slaney filterbank, dB."""
    x = np.asarray(x, np.float64)
    n, hop = cfg.n_fft, cfg.hop_length
    pad = n // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    frames = 1 + len(x) // hop
    k = np.arange(n)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * k / n))  # periodic hann
    idx = (np.arange(frames) * hop)[:, None] + k[None, :]
    spec = np.fft.rfft(xp[idx] * w, axis=-1)
    power = spec.real ** 2 + spec.imag ** 2
    mel = power @ mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                                 cfg.fmin, cfg.fmax).astype(np.float64)
    db = 10.0 * np.log10(np.maximum(mel, cfg.amin))
    db = db - 10.0 * np.log10(max(cfg.amin, cfg.ref))
    if cfg.top_db is not None:
        db = np.maximum(db, db.max() - cfg.top_db)
    return db.astype(np.float32)


def log_mel_spectrogram(x: jax.Array, cfg: LogMelConfig = LogMelConfig(),
                        *, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """(..., L) -> (..., T, n_mels) log-mel in dB."""
    real, imag = stft(x, cfg.stft_cfg, precision=precision)
    power = real ** 2 + imag ** 2
    mel = jax.lax.dot_general(
        power, jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft,
                                          cfg.n_mels, cfg.fmin, cfg.fmax)),
        dimension_numbers=(((power.ndim - 1,), (0,)), ((), ())),
        precision=precision)
    db = 10.0 * jnp.log10(jnp.maximum(mel, cfg.amin))
    db = db - 10.0 * jnp.log10(max(cfg.amin, cfg.ref))
    if cfg.top_db is not None:
        db = jnp.maximum(db, jnp.max(db) - cfg.top_db)
    return db
