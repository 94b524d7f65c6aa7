"""PANN audio encoders (Cnn14 / Cnn10 / Cnn6) — the CLAP audio-branch
alternative to HTSAT (reference models/CLAP/open_clip/pann_model.py:171-684,
selectable via PANN model configs; open_clip/model.py:463-464).

Per-variant structure (pann_model.py):
- Cnn14 (:171-434): six double-3x3 VGG blocks, channels 64..2048 (last
  block unpooled), fc1 2048, fine-grained interpolate ratio 32.
- Cnn10 (:556-684): five double-3x3 blocks, channels 64..1024, fc1 1024,
  ratio 32.
- Cnn6 (:436-554): four single-5x5 blocks, channels 64..512, fc1 512,
  ratio 16.

All variants share: log-mel front-end (lass_tpu.dsp.mel) -> bn0 over mel
bins -> conv stack (avg pooled) -> freq-mean -> {clip path: time max+mean
-> fc1+relu 'embedding'; fine-grained path: k3/s1/p1 max+avg time pools ->
fc1+relu -> frame-repeat upsample}. Dropout/SpecAug only under train=True.

Fusion variants (enable_fusion, pann_model.py:244-272, :300-389): the
(B, 4, T, 64) mel stack + longer flags; 1d pre-fusion via stride-3
mel_conv1d, 2d fusion after conv_block1 via a (6,2)-stride mel_conv2d with
TIME-major chunk concat, channel_map 4-channel first block. As in HTSAT,
the local branch computes for all items and jnp.where(longer) selects.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lass_tpu.dsp.mel import LogMelConfig, log_mel_spectrogram
from lass_tpu.nn.layers import BatchNorm, conv2d

_VARIANTS = {
    # channels, double_conv, kernel, fc_dim, interpolate_ratio
    "Cnn14": ((64, 128, 256, 512, 1024, 2048), True, 3, 2048, 32),
    "Cnn10": ((64, 128, 256, 512, 1024), True, 3, 1024, 32),
    "Cnn6": ((64, 128, 256, 512), False, 5, 512, 16),
}


@dataclasses.dataclass(frozen=True)
class PANNConfig:
    model_name: str = "Cnn14"
    classes_num: int = 527
    mel: LogMelConfig = LogMelConfig()
    enable_fusion: bool = False
    fusion_type: str = "None"

    @property
    def embedding_dim(self) -> int:
        return _VARIANTS[self.model_name][3]

    @property
    def interpolate_ratio(self) -> int:
        return _VARIANTS[self.model_name][4]


class PANNConvBlock(nn.Module):
    """ConvBlock (double 3x3, pann_model.py:33-84) or ConvBlock5x5
    (single 5x5, :86-124), both BN+relu then avg pool."""

    out_channels: int
    double: bool = True
    kernel: int = 3
    momentum: float = 0.1  # torch BatchNorm2d default
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pool: int, train: bool) -> jax.Array:
        k = (self.kernel, self.kernel)
        x = conv2d(self.out_channels, k, use_bias=False, name="conv1",
                   dtype=self.dtype)(x)
        x = jax.nn.relu(BatchNorm(self.out_channels, self.momentum,
                                  name="bn1")(x, train))
        if self.double:
            x = conv2d(self.out_channels, k, use_bias=False, name="conv2",
                       dtype=self.dtype)(x)
            x = jax.nn.relu(BatchNorm(self.out_channels, self.momentum,
                                      name="bn2")(x, train))
        if pool > 1:
            x = nn.avg_pool(x, (pool, pool), (pool, pool))
        return x


class PANN(nn.Module):
    """waveform (B, L) -> {'embedding', 'clipwise_output',
    'fine_grained_embedding'}; fusion configs take mel_fusion/longer."""

    cfg: PANNConfig = PANNConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, waveform: Optional[jax.Array] = None,
                 train: bool = False, *,
                 mel_fusion: Optional[jax.Array] = None,
                 longer: Optional[jax.Array] = None):
        cfg = self.cfg
        channels, double, kernel, fc_dim, ratio = _VARIANTS[cfg.model_name]

        fusion_1d = cfg.enable_fusion and cfg.fusion_type in (
            "daf_1d", "aff_1d", "iaff_1d")
        fusion_2d = cfg.enable_fusion and cfg.fusion_type in (
            "daf_2d", "aff_2d", "iaff_2d")

        if cfg.enable_fusion:
            if mel_fusion is None or longer is None:
                raise ValueError("fusion-enabled PANN takes "
                                 "mel_fusion=(B,4,T,M) and longer=(B,)")
            mel4 = mel_fusion.astype(jnp.float32)
            mel4 = BatchNorm(cfg.mel.n_mels, name="bn0")(mel4, train)
            if fusion_1d:
                mel = self._fuse_1d(mel4, longer, train)  # (B, T, M)
                if train:
                    from lass_tpu.models.clap.htsat import _spec_augment
                    mel = _spec_augment(mel, self.make_rng("specaug"))
                x = mel[..., None].astype(self.dtype)  # (B, T, M, 1)
            else:
                if train:
                    from lass_tpu.models.clap.htsat import _spec_augment
                    mel4 = _spec_augment(mel4, self.make_rng("specaug"))
                # (B, 4, T, M) -> NHWC (B, T, M, 4)
                x = mel4.transpose(0, 2, 3, 1).astype(self.dtype)
        else:
            mel = log_mel_spectrogram(waveform, cfg.mel)  # (B, T, M)
            mel = BatchNorm(cfg.mel.n_mels, name="bn0")(mel, train)
            if train:
                from lass_tpu.models.clap.htsat import _spec_augment
                mel = _spec_augment(mel, self.make_rng("specaug"))
            x = mel[..., None].astype(self.dtype)

        drop = (lambda h, p: nn.Dropout(p, deterministic=not train)(h))

        for i, ch in enumerate(channels):
            pool = 1 if (cfg.model_name == "Cnn14"
                         and i == len(channels) - 1) else 2
            block = PANNConvBlock(ch, double, kernel, dtype=self.dtype,
                                  name=f"conv_block{i + 1}")
            if i == 0 and fusion_2d:
                # 2d fusion: global channel through conv_block1; locals
                # through mel_conv2d, time-major concat (pann_model.py:352-389)
                glob = block(x[..., 0:1], pool, train)
                x = self._fuse_2d(x, glob, longer, train)
            else:
                x = block(x, pool, train)
            x = drop(x, 0.2)

        x = jnp.mean(x, axis=2)  # freq mean -> (B, T', C)

        # fine-grained path (pann_model.py:406-412)
        lat1 = nn.max_pool(x, (3,), (1,), padding=((1, 1),))
        lat2 = nn.avg_pool(x, (3,), (1,), padding=((1, 1),))
        fc1 = nn.Dense(fc_dim, dtype=self.dtype, name="fc1")
        lat = jax.nn.relu(fc1((lat1 + lat2).astype(self.dtype)))
        fine_grained = jnp.repeat(lat.astype(jnp.float32), ratio, axis=1)

        x1 = jnp.max(x, axis=1)
        x2 = jnp.mean(x, axis=1)
        h = drop(x1 + x2, 0.5)
        h = jax.nn.relu(fc1(h.astype(self.dtype)))
        embedding = drop(h, 0.5)
        clipwise = jax.nn.sigmoid(
            nn.Dense(cfg.classes_num, name="fc_audioset")(
                h.astype(jnp.float32)))
        return {"embedding": embedding.astype(jnp.float32),
                "clipwise_output": clipwise,
                "fine_grained_embedding": fine_grained}

    def _fusion_block(self, channels: int):
        from lass_tpu.models.clap.fusion import AFF, DAF, iAFF

        kind = self.cfg.fusion_type.split("_")[0]
        if kind == "daf":
            return DAF(name="fusion_model")
        if kind == "aff":
            return AFF(channels=channels, name="fusion_model")
        return iAFF(channels=channels, name="fusion_model")

    def _fuse_1d(self, mel4: jax.Array, longer: jax.Array, train: bool
                 ) -> jax.Array:
        """Same shape algebra as HTSAT's 1d fusion (pann_model.py:304-343)."""
        b, _, t, f = mel4.shape
        glob = mel4[:, 0]
        local = mel4[:, 1:].reshape(b * 3, t, f)
        h = nn.Conv(f, (5,), strides=(3,), padding=[(2, 2)],
                    name="mel_conv1d")(local)
        h = BatchNorm(f, momentum=0.1, name="mel_conv1d_bn")(h, train)
        t2 = h.shape[1]
        h = h.reshape(b, 3 * t2, f)
        h = h[:, :t] if 3 * t2 >= t else jnp.pad(
            h, ((0, 0), (0, t - 3 * t2), (0, 0)))
        fused = self._fusion_block(f)(glob, h, train)
        return jnp.where(longer[:, None, None], fused, glob)

    def _fuse_2d(self, x: jax.Array, glob: jax.Array, longer: jax.Array,
                 train: bool) -> jax.Array:
        """mel_conv2d = Conv2d(1->64, 5x5, stride (6,2), pad (2,2)) + BN +
        ReLU; chunk-major TIME concat, pad/trim to the global height
        (pann_model.py:259-265, :352-389)."""
        b, t, f, _ = x.shape
        loc = jnp.moveaxis(x[..., 1:4], -1, 1).reshape(b * 3, t, f, 1)
        loc = nn.Conv(64, (5, 5), strides=(6, 2), padding=[(2, 2), (2, 2)],
                      dtype=self.dtype, name="mel_conv2d")(loc)
        loc = BatchNorm(64, momentum=0.1, name="mel_conv2d_bn")(loc, train)
        loc = jax.nn.relu(loc)
        th, tw = loc.shape[1], loc.shape[2]
        loc = loc.reshape(b, 3 * th, tw, 64)  # chunk-major time concat
        gh = glob.shape[1]
        if 3 * th >= gh:
            loc = loc[:, :gh]
        else:
            loc = jnp.pad(loc, ((0, 0), (0, gh - 3 * th), (0, 0), (0, 0)))
        # width: the stride-2 conv's 32 bins match conv_block1's pooled
        # width by construction (the reference would shape-error otherwise)
        assert loc.shape[2] == glob.shape[2], (loc.shape, glob.shape)
        fused = self._fusion_block(64)(glob.astype(jnp.float32),
                                       loc.astype(jnp.float32), train)
        return jnp.where(longer[:, None, None, None], fused,
                         glob.astype(jnp.float32)).astype(self.dtype)


def Cnn14(cfg: Optional[PANNConfig] = None, dtype: Any = jnp.float32
          ) -> PANN:
    cfg = cfg or PANNConfig()
    return PANN(dataclasses.replace(cfg, model_name="Cnn14"), dtype)


def Cnn10(cfg: Optional[PANNConfig] = None, dtype: Any = jnp.float32
          ) -> PANN:
    cfg = cfg or PANNConfig(model_name="Cnn10")
    return PANN(dataclasses.replace(cfg, model_name="Cnn10"), dtype)


def Cnn6(cfg: Optional[PANNConfig] = None, dtype: Any = jnp.float32
         ) -> PANN:
    cfg = cfg or PANNConfig(model_name="Cnn6")
    return PANN(dataclasses.replace(cfg, model_name="Cnn6"), dtype)
