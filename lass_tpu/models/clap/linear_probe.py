"""CLAP linear-probe head: frozen (or finetuned) audio branch + classifier.

Reference: /root/reference/models/CLAP/open_clip/linear_probe.py:7-66
(LinearProbe over audio_branch embedding -> audio_projection -> lp_layer)
and model.py:27-44 (MLPLayers). The torch layout nests the CLAP model under
``clap_model.`` and the head under ``lp_layer.`` — mirrored here so converted
checkpoints map mechanically.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lass_tpu.models.clap.model import MLPProjection


class MLPLayers(nn.Module):
    """Dense -> ReLU -> Dropout chain, last layer bare
    (reference model.py:27-44; layers named by their position in the torch
    nn.Sequential: linear i lives at index 3*i)."""

    units: Tuple[int, ...] = (512, 512, 512)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n = len(self.units) - 1
        for i, u in enumerate(self.units[1:]):
            x = nn.Dense(u, name=f"linear{i}")(x)
            if i < n - 1:
                x = jax.nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class _ClapAudioTrunk(nn.Module):
    """audio_branch + audio_projection WITHOUT the L2 normalize (the probe
    consumes the raw projection, linear_probe.py:58-62)."""

    audio_model: str = "HTSAT"
    audio_cfg: Any = None
    joint_embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, waveform, train, *, mel_fusion=None, longer=None):
        if self.audio_model.upper() == "HTSAT":
            from lass_tpu.models.clap.htsat import HTSAT, HTSATConfig

            branch = HTSAT(self.audio_cfg or HTSATConfig(), self.dtype,
                           name="audio_branch")
        elif self.audio_model.upper() == "PANN":
            from lass_tpu.models.clap.pann import PANN, PANNConfig

            branch = PANN(self.audio_cfg or PANNConfig(), self.dtype,
                          name="audio_branch")
        else:
            raise ValueError(f"unknown audio_model {self.audio_model!r}")
        out = branch(waveform, train, mel_fusion=mel_fusion, longer=longer)
        return MLPProjection(self.joint_embed_dim, self.dtype,
                             name="audio_projection")(out["embedding"])


class LinearProbe(nn.Module):
    """Audio waveform -> class logits (or activated probabilities).

    freeze=True reproduces the reference semantics (linear_probe.py:28-30,
    54-56): the CLAP trunk runs in eval mode (BN running stats, no dropout)
    and receives no gradient; only ``lp_layer`` trains.
    """

    out_ch: int
    mlp: bool = False
    freeze: bool = True
    in_ch: int = 512
    act: Optional[str] = None  # None|relu|elu|sigmoid|softmax
    audio_model: str = "HTSAT"
    audio_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, waveform: Optional[jax.Array] = None,
                 train: bool = False, *,
                 mel_fusion: Optional[jax.Array] = None,
                 longer: Optional[jax.Array] = None) -> jax.Array:
        trunk = _ClapAudioTrunk(self.audio_model, self.audio_cfg,
                                self.in_ch, self.dtype, name="clap_model")
        feats = trunk(waveform, train and not self.freeze,
                      mel_fusion=mel_fusion, longer=longer)
        if self.freeze:
            feats = jax.lax.stop_gradient(feats)
        if self.mlp:
            out = MLPLayers((self.in_ch, self.in_ch * 2, self.out_ch),
                            name="lp_layer")(feats, train)
        else:
            out = nn.Dense(self.out_ch, name="lp_layer")(feats)
        if self.act == "relu":
            out = jax.nn.relu(out)
        elif self.act == "elu":
            out = jax.nn.elu(out)
        elif self.act == "sigmoid":
            out = jax.nn.sigmoid(out)
        elif self.act == "softmax":
            out = jax.nn.softmax(out, axis=-1)
        elif self.act not in (None, "None"):
            raise ValueError(f"unknown act {self.act!r}")
        return out
