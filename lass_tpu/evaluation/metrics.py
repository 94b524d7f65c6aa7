"""SDR / SI-SDR metrics, numerically identical to reference utils.py:148-200.

These are the parity oracle for the DCASE harness, so they stay in NumPy
(they run on eval hosts, not on the hot path). Batched jnp variants are
provided for on-device evaluation sweeps.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def calculate_sdr(ref: np.ndarray, est: np.ndarray, eps: float = 1e-10) -> float:
    noise = est - ref
    num = np.clip(np.mean(ref ** 2), eps, None)
    den = np.clip(np.mean(noise ** 2), eps, None)
    return float(10.0 * np.log10(num / den))


def calculate_sisdr(ref: np.ndarray, est: np.ndarray) -> float:
    eps = np.finfo(ref.dtype).eps
    reference = ref.reshape(-1, 1).astype(ref.dtype)
    estimate = est.reshape(-1, 1).astype(ref.dtype)
    rss = float(reference.T @ reference)
    a = (eps + float(reference.T @ estimate)) / (rss + eps)
    e_true = a * reference
    e_res = estimate - e_true
    sss = float((e_true ** 2).sum())
    snn = float((e_res ** 2).sum())
    return float(10 * np.log10((eps + sss) / (eps + snn)))


def get_mean_sdr_from_dict(sdris_dict) -> float:
    """reference utils.py:228-230."""
    return float(np.nanmean(list(sdris_dict.values())))


def calculate_segmentwise_sdr(ref: np.ndarray, est: np.ndarray,
                              hop_samples: int,
                              return_sdr_list: bool = False):
    """Median of per-segment SDRs (reference utils.py:273-290)."""
    min_len = min(ref.shape[-1], est.shape[-1])
    sdrs = []
    pointer = 0
    while pointer + hop_samples < min_len:
        sdrs.append(calculate_sdr(ref[..., pointer:pointer + hop_samples],
                                  est[..., pointer:pointer + hop_samples]))
        pointer += hop_samples
    sdr = float(np.nanmedian(sdrs))
    return (sdr, sdrs) if return_sdr_list else sdr


def remove_silence(audio: np.ndarray, sample_rate: int,
                   threshold: float = 0.02) -> np.ndarray:
    """Drop 100 ms frames whose peak is below threshold
    (reference utils.py:233-263)."""
    window = int(sample_rate * 0.1)
    n = (len(audio) // window) * window
    frames = audio[:n].reshape(-1, window)
    active = np.max(np.abs(frames), axis=-1) > threshold
    return frames[active].flatten()


def repeat_to_length(audio: np.ndarray, segment_samples: int) -> np.ndarray:
    """Tile audio up to a target length (reference utils.py:265-271)."""
    repeats = segment_samples // audio.shape[-1] + 1
    return np.tile(audio, repeats)[:segment_samples]


def batch_sdr(ref: jax.Array, est: jax.Array, eps: float = 1e-10) -> jax.Array:
    """(B, L) -> (B,) SDR on device."""
    noise = est - ref
    num = jnp.clip(jnp.mean(ref ** 2, axis=-1), eps, None)
    den = jnp.clip(jnp.mean(noise ** 2, axis=-1), eps, None)
    return 10.0 * jnp.log10(num / den)


def batch_sisdr(ref: jax.Array, est: jax.Array) -> jax.Array:
    """(B, L) -> (B,) scale-invariant SDR on device."""
    eps = jnp.finfo(ref.dtype).eps
    rss = jnp.sum(ref * ref, axis=-1, keepdims=True)
    a = (eps + jnp.sum(ref * est, axis=-1, keepdims=True)) / (rss + eps)
    e_true = a * ref
    e_res = est - e_true
    sss = jnp.sum(e_true ** 2, axis=-1)
    snn = jnp.sum(e_res ** 2, axis=-1)
    return 10.0 * jnp.log10((eps + sss) / (eps + snn))
