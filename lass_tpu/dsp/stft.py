"""TPU-native STFT / ISTFT / magphase.

Semantics match the reference stack's torchlibrosa layers (librosa conventions:
center=True reflect padding, periodic hann window padded to n_fft, rfft sign
convention) — see /root/reference/models/resunet.py:284-302 and
/root/reference/models/base.py:79-113 for the behavior being reproduced.

Design (TPU-first, not a port):
- The analysis transform is ONE strided convolution with a precomputed
  windowed-DFT kernel: (B, 1, L) -> (B, 2F, T). XLA lowers this to MXU
  matmuls; there is no framing gather and no Python per-channel loop.
- The synthesis transform fuses the inverse DFT and the synthesis window into
  ONE matmul followed by a vectorized overlap-add (chunked shift-add, no
  scatter), then divides by a precomputed window-sumsquare envelope that is a
  trace-time constant for static shapes.
- All basis matrices / envelopes are host-precomputed numpy constants, cached
  per configuration, and folded into the jitted graph.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lass_tpu.dsp.window import get_window, pad_center


@dataclasses.dataclass(frozen=True)
class STFTConfig:
    """STFT configuration (defaults = the ResUNet30 front-end,
    reference resunet.py:271-276)."""

    n_fft: int = 1024
    hop_length: int = 160
    win_length: Optional[int] = None
    window: str = "hann"
    center: bool = True
    pad_mode: str = "reflect"

    @property
    def freq_bins(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def effective_win_length(self) -> int:
        return self.win_length if self.win_length is not None else self.n_fft

    def num_frames(self, length: int) -> int:
        pad = self.n_fft // 2 if self.center else 0
        return (length + 2 * pad - self.n_fft) // self.hop_length + 1


def _padded_window(cfg: STFTConfig) -> np.ndarray:
    win = get_window(cfg.window, cfg.effective_win_length)
    return pad_center(win, cfg.n_fft)


@functools.lru_cache(maxsize=None)
def _analysis_basis(cfg: STFTConfig) -> np.ndarray:
    """(n_fft, 2F) windowed DFT basis; columns [0:F]=real, [F:2F]=imag.

    X_k = sum_t x_t w_t cos(2 pi k t / N) - i * sum_t x_t w_t sin(...)
    (np.fft.rfft sign convention, as used by librosa/torch.stft).
    """
    n = cfg.n_fft
    f = cfg.freq_bins
    w = _padded_window(cfg)
    t = np.arange(n)[:, None]
    k = np.arange(f)[None, :]
    ang = 2.0 * np.pi * k * t / n
    real = np.cos(ang) * w[:, None]
    imag = -np.sin(ang) * w[:, None]
    return np.concatenate([real, imag], axis=1).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _synthesis_basis(cfg: STFTConfig) -> np.ndarray:
    """(2F, n_fft) basis mapping [real|imag] spectra -> windowed time frames.

    frame_t = window_t * irfft(X)_t, expanded over the onesided spectrum with
    weight 2 on interior bins. The sin terms at k=0 and k=N/2 vanish for
    integer t, matching the real part of the full ifft.
    """
    n = cfg.n_fft
    f = cfg.freq_bins
    w = _padded_window(cfg)
    k = np.arange(f)[:, None]
    t = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * t / n
    weight = np.full((f, 1), 2.0)
    weight[0, 0] = 1.0
    weight[-1, 0] = 1.0
    real_rows = weight * np.cos(ang) / n * w[None, :]
    imag_rows = -weight * np.sin(ang) / n * w[None, :]
    return np.concatenate([real_rows, imag_rows], axis=0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _synthesis_basis_no_nyquist(cfg: STFTConfig) -> np.ndarray:
    """(2(F-1), n_fft) synthesis basis without the Nyquist rows. Exact when
    the Nyquist coefficient is zero (e.g. the mask head's output, where the
    phase-rotation factor is exactly 0 for zero logits on the padded bin)."""
    basis = _synthesis_basis(cfg)
    f = cfg.freq_bins
    keep = [i for i in range(2 * f) if i not in (f - 1, 2 * f - 1)]
    return basis[keep]


@functools.lru_cache(maxsize=None)
def _window_sumsquare(cfg: STFTConfig, num_frames: int) -> np.ndarray:
    """Overlap-added squared-window envelope over the padded output length."""
    n, hop = cfg.n_fft, cfg.hop_length
    length = (num_frames - 1) * hop + n
    w2 = _padded_window(cfg) ** 2
    env = np.zeros(length)
    for i in range(num_frames):
        env[i * hop:i * hop + n] += w2
    return np.maximum(env, 1e-11).astype(np.float32)


def _pad_signal(x: jax.Array, cfg: STFTConfig) -> jax.Array:
    if not cfg.center:
        return x
    p = cfg.n_fft // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(p, p)]
    return jnp.pad(x, pad, mode=cfg.pad_mode)


@functools.lru_cache(maxsize=None)
def _analysis_basis_padded(cfg: STFTConfig) -> np.ndarray:
    """(R*hop, 2F) basis: the windowed-DFT rows zero-extended to a whole
    number of hop-sized rows (R = ceil(n_fft / hop))."""
    basis = _analysis_basis(cfg)  # (n_fft, 2F)
    r = -(-cfg.n_fft // cfg.hop_length)
    out = np.zeros((r * cfg.hop_length, basis.shape[1]), np.float32)
    out[:cfg.n_fft] = basis
    return out


def stft(
    x: jax.Array,
    cfg: STFTConfig = STFTConfig(),
    *,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array]:
    """STFT over the last axis. x: (..., L) -> (real, imag) each (..., T, F).

    Framing trick for the MXU: a Cin=1 strided conv is a terrible TPU shape
    (profiled at ~5% MXU), so instead view the padded signal as hop-sized
    rows, stack R = ceil(n_fft/hop) shifted row views, and run ONE dense
    (B*T, R*hop) @ (R*hop, 2F) matmul against the zero-row-extended
    windowed-DFT basis. Frame t starts at t*hop = row t exactly.
    """
    lead = x.shape[:-1]
    hop = cfg.hop_length
    xp = _pad_signal(x.astype(jnp.float32), cfg)
    lp = xp.shape[-1]
    t_frames = (lp - cfg.n_fft) // hop + 1
    r = -(-cfg.n_fft // hop)
    n_rows = t_frames + r - 1  # rows touched by the last frame
    if n_rows * hop > lp:
        xp = jnp.pad(xp, [(0, 0)] * (xp.ndim - 1)
                     + [(0, n_rows * hop - lp)])
    rows = xp[..., :n_rows * hop].reshape((-1, n_rows, hop))
    frames = jnp.stack(
        [jax.lax.slice_in_dim(rows, k, k + t_frames, axis=1)
         for k in range(r)], axis=2)  # (batch, T, R, hop)
    frames = frames.reshape(frames.shape[0], t_frames, r * hop)
    basis = jnp.asarray(_analysis_basis_padded(cfg))  # (R*hop, 2F)
    out = jax.lax.dot_general(
        frames, basis,
        dimension_numbers=(((2,), (0,)), ((), ())),
        precision=precision,
    )  # (batch, T, 2F)
    f = cfg.freq_bins
    out = out.reshape(lead + out.shape[1:])
    return out[..., :f], out[..., f:]


def istft(
    real: jax.Array,
    imag: jax.Array,
    length: int,
    cfg: STFTConfig = STFTConfig(),
    *,
    precision=jax.lax.Precision.HIGHEST,
    truncated_nyquist: bool = False,
) -> jax.Array:
    """Inverse STFT. real/imag: (..., T, F) -> (..., length).

    Fused IDFT-and-window matmul + chunked-shift overlap-add + constant
    envelope division. No scatters, no dynamic shapes.

    truncated_nyquist=True consumes (..., T, F-1) inputs, treating the
    Nyquist bin as exactly zero (valid for the mask head's output) — keeps
    the lane dimension a power of two on TPU and skips a pad.
    """
    t_frames = real.shape[-2]
    n, hop = cfg.n_fft, cfg.hop_length
    spec = jnp.concatenate(
        [real.astype(jnp.float32), imag.astype(jnp.float32)], axis=-1
    )  # (..., T, 2F) or (..., T, 2(F-1))
    basis = jnp.asarray(_synthesis_basis_no_nyquist(cfg)
                        if truncated_nyquist else _synthesis_basis(cfg))
    frames = jax.lax.dot_general(
        spec, basis,
        dimension_numbers=(((spec.ndim - 1,), (0,)), ((), ())),
        precision=precision,
    )  # (..., T, n_fft)

    # Overlap-add: pad frame length to a multiple of hop, view as chunks of
    # size hop, and sum the n_chunks diagonal shifts.
    n_chunks = -(-n // hop)
    n_pad = n_chunks * hop
    if n_pad != n:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, n_pad - n)])
    lead = frames.shape[:-2]
    chunks = frames.reshape(lead + (t_frames, n_chunks, hop))
    total_chunks = t_frames + n_chunks - 1
    zeros_pad = [(0, 0)] * len(lead)
    out = sum(
        jnp.pad(chunks[..., :, c, :],
                zeros_pad + [(c, n_chunks - 1 - c), (0, 0)])
        for c in range(n_chunks)
    )
    y = out.reshape(lead + (total_chunks * hop,))
    padded_len = (t_frames - 1) * hop + n
    y = y[..., :padded_len]

    env = jnp.asarray(_window_sumsquare(cfg, t_frames))
    y = y / env

    start = n // 2 if cfg.center else 0
    return jax.lax.dynamic_slice_in_dim(y, start, length, axis=-1)


def magphase(
    real: jax.Array, imag: jax.Array, clamp: float = 1e-10
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(mag, cos, sin) with torchlibrosa.stft.magphase clamping semantics."""
    mag = jnp.sqrt(real ** 2 + imag ** 2)
    denom = jnp.maximum(mag, clamp)
    return mag, real / denom, imag / denom


def spectrogram_phase(
    real: jax.Array, imag: jax.Array, eps: float = 1e-10
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(mag, cos, sin) with reference Base.spectrogram_phase semantics
    (eps clamps the *power* before the sqrt; base.py:83-88)."""
    mag = jnp.sqrt(jnp.maximum(real ** 2 + imag ** 2, eps))
    return mag, real / mag, imag / mag


def spectrogram_to_wav(
    x: jax.Array,
    spectrogram: jax.Array,
    length: int,
    cfg: STFTConfig = STFTConfig(),
    *,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Rebuild waveforms from a (possibly modified) magnitude spectrogram
    using the phase of ``x`` (reference base.py:133-152, vectorized over
    channels). x: (B, C, L); spectrogram: (B, T, F, C) -> (B, C, length)."""
    real, imag = wav_to_spectrogram_complex(x, cfg, precision=precision)
    _, cos, sin = magphase(real, imag)
    b, t, f, c = spectrogram.shape
    out_real = jnp.moveaxis(spectrogram * cos, -1, 1).reshape(b * c, t, f)
    out_imag = jnp.moveaxis(spectrogram * sin, -1, 1).reshape(b * c, t, f)
    wav = istft(out_real, out_imag, length, cfg, precision=precision)
    return wav.reshape(b, c, length)


def multi_resolution_spectrogram_phase(
    x: jax.Array,
    win_lengths,
    hop_length: int = 160,
    eps: float = 1e-10,
):
    """(B, C, L) -> {win: (mag, cos, sin) each (B, T, F_win, C)}.

    All windows share the hop, so frame counts are identical (center
    padding is n_fft//2 per window). This is the per-window STFT bank of the
    precompute pipeline (reference scripts/precompute_stfts.py:19-58) and
    the multi-resolution model input.
    """
    return {
        int(w): wav_to_spectrogram_phase(
            x, STFTConfig(n_fft=int(w), hop_length=hop_length), eps)
        for w in win_lengths
    }


def wav_to_spectrogram_complex(
    x: jax.Array,
    cfg: STFTConfig = STFTConfig(),
    *,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array]:
    """(B, C, L) -> (real, imag) each (B, T, F, C) [NHWC layout]."""
    b, c, l = x.shape
    real, imag = stft(x.reshape(b * c, l), cfg, precision=precision)
    t, f = real.shape[-2:]
    real = jnp.moveaxis(real.reshape(b, c, t, f), 1, -1)
    imag = jnp.moveaxis(imag.reshape(b, c, t, f), 1, -1)
    return real, imag


def wav_to_spectrogram_phase(
    x: jax.Array,
    cfg: STFTConfig = STFTConfig(),
    eps: float = 1e-10,
    *,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(B, C, L) -> (mag, cos, sin) each (B, T, F, C) [NHWC layout].

    Channel-vectorized equivalent of reference base.py:91-113 (which loops
    over channels in Python).
    """
    real, imag = wav_to_spectrogram_complex(x, cfg, precision=precision)
    return spectrogram_phase(real, imag, eps)
