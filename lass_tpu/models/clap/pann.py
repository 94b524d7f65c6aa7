"""PANN Cnn14 audio encoder — the CLAP audio-branch alternative to HTSAT
(reference models/CLAP/open_clip/pann_model.py:171-434, selectable via the
PANN-14 model config; open_clip/model.py:463-464).

Non-fusion path: log-mel front-end (shared with HTSAT, lass_tpu.dsp.mel) ->
bn0 over mel bins -> six VGG-style conv blocks (avg-pooled, channels
64..2048) -> freq-mean -> time max+mean pool -> fc1+relu = 2048-d
'embedding' for the CLAP audio projection. Dropout only under train=True.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from lass_tpu.dsp.mel import LogMelConfig, log_mel_spectrogram
from lass_tpu.nn.layers import BatchNorm, conv2d


@dataclasses.dataclass(frozen=True)
class PANNConfig:
    classes_num: int = 527
    mel: LogMelConfig = LogMelConfig()
    embedding_dim: int = 2048


class PANNConvBlock(nn.Module):
    out_channels: int
    momentum: float = 0.1  # torch BatchNorm2d default (pann_model.py:56-57)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pool: int, train: bool) -> jax.Array:
        x = conv2d(self.out_channels, (3, 3), use_bias=False, name="conv1",
                   dtype=self.dtype)(x)
        x = jax.nn.relu(BatchNorm(self.out_channels, self.momentum,
                                  name="bn1")(x, train))
        x = conv2d(self.out_channels, (3, 3), use_bias=False, name="conv2",
                   dtype=self.dtype)(x)
        x = jax.nn.relu(BatchNorm(self.out_channels, self.momentum,
                                  name="bn2")(x, train))
        if pool > 1:
            x = nn.avg_pool(x, (pool, pool), (pool, pool))
        return x


class Cnn14(nn.Module):
    cfg: PANNConfig = PANNConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, waveform: jax.Array, train: bool = False):
        cfg = self.cfg
        mel = log_mel_spectrogram(waveform, cfg.mel)  # (B, T, M)
        mel = BatchNorm(cfg.mel.n_mels, name="bn0")(mel, train)
        x = mel[..., None].astype(self.dtype)  # (B, T, M, 1)

        drop = (lambda h, p: nn.Dropout(p, deterministic=not train)(h))
        channels = [64, 128, 256, 512, 1024, 2048]
        for i, ch in enumerate(channels):
            pool = 1 if i == len(channels) - 1 else 2
            x = PANNConvBlock(ch, dtype=self.dtype,
                              name=f"conv_block{i + 1}")(x, pool, train)
            x = drop(x, 0.2)

        x = jnp.mean(x, axis=2)  # freq mean -> (B, T', C)
        x1 = jnp.max(x, axis=1)
        x2 = jnp.mean(x, axis=1)
        h = drop(x1 + x2, 0.5)
        h = jax.nn.relu(nn.Dense(cfg.embedding_dim, dtype=self.dtype,
                                 name="fc1")(h.astype(self.dtype)))
        embedding = drop(h, 0.5)
        clipwise = jax.nn.sigmoid(
            nn.Dense(cfg.classes_num, name="fc_audioset")(
                h.astype(jnp.float32)))
        return {"embedding": embedding.astype(jnp.float32),
                "clipwise_output": clipwise}
