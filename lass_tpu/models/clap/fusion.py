"""Attentional feature fusion blocks + long-audio mel-fusion features.

Behavioral spec: reference models/CLAP/open_clip/feature_fusion.py
(DAF :11-21, iAFF :23-131, AFF :133-192 — WACV'21 Attentional Feature
Fusion) and the 'fusion' branch of get_audio_features
(training/data.py:467-517: 3 randomly-placed mel chunks + a resized global
mel stacked (4, T, M)). These are only active for fusion-enabled CLAP
audio encoders; LASS disables fusion (clap_encoder.py:22) but the variant
is part of the reference surface.

The reference duplicates batch-of-1 inputs as a BN workaround
(feature_fusion.py:114-117); not reproduced — our BatchNorm handles any
batch in eval mode and training batches are > 1.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lass_tpu.nn.layers import BatchNorm


class DAF(nn.Module):
    """Direct-add fusion."""

    @nn.compact
    def __call__(self, x: jax.Array, residual: jax.Array,
                 train: bool = False) -> jax.Array:
        return x + residual


class _AttBranch(nn.Module):
    """conv1x1 -> BN -> relu -> conv1x1 -> BN, optionally over the global
    average (channels last; works for both 1D (B, T, C) and 2D
    (B, H, W, C))."""

    channels: int
    inter_channels: int
    global_pool: bool = False
    momentum: float = 0.1  # torch BatchNorm default

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        h = x
        if self.global_pool:
            axes = tuple(range(1, x.ndim - 1))
            h = jnp.mean(h, axis=axes, keepdims=True)
        h = nn.Dense(self.inter_channels, name="fc1")(h)
        h = BatchNorm(self.inter_channels, self.momentum, name="bn1")(h, train)
        h = jax.nn.relu(h)
        h = nn.Dense(self.channels, name="fc2")(h)
        return BatchNorm(self.channels, self.momentum, name="bn2")(h, train)


class AFF(nn.Module):
    channels: int = 64
    r: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, residual: jax.Array,
                 train: bool = False) -> jax.Array:
        inter = self.channels // self.r
        xa = x + residual
        xl = _AttBranch(self.channels, inter, name="local_att")(xa, train)
        xg = _AttBranch(self.channels, inter, global_pool=True,
                        name="global_att")(xa, train)
        wei = jax.nn.sigmoid(xl + xg)
        return 2 * x * wei + 2 * residual * (1 - wei)


class iAFF(nn.Module):
    channels: int = 64
    r: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, residual: jax.Array,
                 train: bool = False) -> jax.Array:
        inter = self.channels // self.r
        xa = x + residual
        global_att = _AttBranch(self.channels, inter, global_pool=True,
                                name="global_att")
        xl = _AttBranch(self.channels, inter, name="local_att")(xa, train)
        wei = jax.nn.sigmoid(xl + global_att(xa, train))
        xi = x * wei + residual * (1 - wei)
        xl2 = _AttBranch(self.channels, inter, name="local_att2")(xi, train)
        # NOTE: the reference reuses global_att (not global_att2) in the
        # second round (feature_fusion.py:124) — same shared module here.
        wei2 = jax.nn.sigmoid(xl2 + global_att(xi, train))
        return x * wei2 + residual * (1 - wei2)


def build_mel_fusion(mel: np.ndarray, chunk_frames: int,
                     rng: Optional[np.random.Generator] = None
                     ) -> tuple:
    """(T, M) log-mel of a LONG clip -> ((4, chunk_frames, M), longer):
    three randomly-placed chunks (front/middle/back thirds) + the global
    mel resized to chunk_frames (training/data.py:467-517)."""
    rng = rng or np.random.default_rng()
    total = mel.shape[0]
    if chunk_frames >= total:
        stack = np.stack([mel, mel, mel, mel])
        return stack.astype(np.float32), False
    ranges = np.array_split(np.arange(0, total - chunk_frames + 1), 3)
    picks = []
    for part in ranges:
        picks.append(int(rng.choice(part)) if len(part) else 0)
    chunks = [mel[p:p + chunk_frames] for p in picks]
    # global shrink: bilinear over time, align_corners=False — the exact
    # sampling of torchvision.transforms.Resize (training/data.py:507) when
    # the mel-bin axis is size-preserving
    src = (np.arange(chunk_frames) + 0.5) * (total / chunk_frames) - 0.5
    src = np.clip(src, 0.0, total - 1)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, total - 1)
    frac = (src - lo)[:, None]
    shrink = mel[lo] * (1 - frac) + mel[hi] * frac
    return (np.stack(chunks + [shrink]).astype(np.float32), True)
