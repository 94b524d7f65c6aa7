"""CLAP joint-embedding components needed for LASS.

Reference: models/CLAP/open_clip/model.py — roberta branch + 2-layer MLP
text_projection (:517-531), audio_projection (:565-570), normalized
embeddings (:732-781). Only the pieces the separation stack uses are here;
the contrastive-pretraining harness (loss.py, training/) is out of scope by
design (SURVEY.md §2.4: "vestigial for LASS").
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lass_tpu.models.clap.roberta import RobertaConfig, RobertaModel


class MLPProjection(nn.Module):
    """Linear -> ReLU -> Linear projection into the joint space
    (model.py:517-531 text_projection / :565-570 audio_projection)."""

    out_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


class CLAPTextEncoder(nn.Module):
    """Caption token ids -> normalized 512-d joint embedding
    (model.py:658-665 encode_text + :732-752 get_text_embedding)."""

    roberta_cfg: RobertaConfig = RobertaConfig()
    joint_embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array
                 ) -> jax.Array:
        _, pooled = RobertaModel(self.roberta_cfg, self.dtype,
                                 name="roberta")(input_ids, attention_mask)
        proj = MLPProjection(self.joint_embed_dim, self.dtype,
                             name="text_projection")(pooled)
        norm = jnp.linalg.norm(proj, axis=-1, keepdims=True)
        return proj / jnp.maximum(norm, 1e-12)


class CLAPBertTextEncoder(nn.Module):
    """BERT text branch: pooler_output -> text_projection -> normalize
    (model.py:503-516 construction, :644-657 encode_text 'bert')."""

    bert_cfg: Any = None  # BertConfig; None -> bert-base-uncased
    joint_embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 token_type_ids: Optional[jax.Array] = None) -> jax.Array:
        from lass_tpu.models.clap.bert import BertConfig, BertModel

        cfg = self.bert_cfg or BertConfig()
        _, pooled = BertModel(cfg, self.dtype, name="bert")(
            input_ids, attention_mask, token_type_ids)
        proj = MLPProjection(self.joint_embed_dim, self.dtype,
                             name="text_projection")(pooled)
        norm = jnp.linalg.norm(proj, axis=-1, keepdims=True)
        return proj / jnp.maximum(norm, 1e-12)


class CLAPBartTextEncoder(nn.Module):
    """BART text branch: mean over encoder_last_hidden_state ->
    text_projection -> normalize (model.py:533-546, :666-676 — the
    reference's mean is over ALL positions including padding, reproduced
    verbatim)."""

    bart_cfg: Any = None  # BartConfig; None -> facebook/bart-base
    joint_embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array
                 ) -> jax.Array:
        from lass_tpu.models.clap.bert import BartConfig, BartEncoderModel

        cfg = self.bart_cfg or BartConfig()
        hidden = BartEncoderModel(cfg, self.dtype, name="bart")(
            input_ids, attention_mask)
        proj = MLPProjection(self.joint_embed_dim, self.dtype,
                             name="text_projection")(jnp.mean(hidden, axis=1))
        norm = jnp.linalg.norm(proj, axis=-1, keepdims=True)
        return proj / jnp.maximum(norm, 1e-12)


class CLAPAudioEncoder(nn.Module):
    """48 kHz waveform (B, L) -> normalized 512-d joint embedding:
    HTSAT 'embedding' + audio_projection MLP + normalize
    (model.py:754-781 get_audio_embedding over the HTSAT branch).

    Fusion-enabled configs take ``mel_fusion`` (B, 4, T, n_mels) +
    ``longer`` (B,) instead of a waveform (htsat.py:1150-1207)."""

    htsat_cfg: Any = None  # HTSATConfig; None -> base
    joint_embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, waveform: Optional[jax.Array] = None,
                 train: bool = False, *,
                 mel_fusion: Optional[jax.Array] = None,
                 longer: Optional[jax.Array] = None) -> jax.Array:
        from lass_tpu.models.clap.htsat import HTSAT, HTSATConfig

        cfg = self.htsat_cfg or HTSATConfig()
        out = HTSAT(cfg, self.dtype, name="audio_branch")(
            waveform, train, mel_fusion=mel_fusion, longer=longer)
        proj = MLPProjection(self.joint_embed_dim, self.dtype,
                             name="audio_projection")(out["embedding"])
        norm = jnp.linalg.norm(proj, axis=-1, keepdims=True)
        return proj / jnp.maximum(norm, 1e-12)


class CLAPPANNAudioEncoder(nn.Module):
    """CLAP audio branch over a PANN CNN instead of HTSAT (the selectable
    alternative, model.py:463-464 `if audio_cfg.model_type == "PANN"`)."""

    pann_cfg: Any = None  # PANNConfig; None -> Cnn14
    joint_embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, waveform: Optional[jax.Array] = None,
                 train: bool = False, *,
                 mel_fusion: Optional[jax.Array] = None,
                 longer: Optional[jax.Array] = None) -> jax.Array:
        from lass_tpu.models.clap.pann import PANN, PANNConfig

        cfg = self.pann_cfg or PANNConfig()
        out = PANN(cfg, self.dtype, name="audio_branch")(
            waveform, train, mel_fusion=mel_fusion, longer=longer)
        proj = MLPProjection(self.joint_embed_dim, self.dtype,
                             name="audio_projection")(out["embedding"])
        norm = jnp.linalg.norm(proj, axis=-1, keepdims=True)
        return proj / jnp.maximum(norm, 1e-12)


class CLAPAudioProjection(nn.Module):
    """HTSAT embedding -> normalized 512-d joint embedding
    (model.py:754-781 get_audio_embedding)."""

    joint_embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio_embedding: jax.Array) -> jax.Array:
        proj = MLPProjection(self.joint_embed_dim, self.dtype,
                             name="audio_projection")(audio_embedding)
        norm = jnp.linalg.norm(proj, axis=-1, keepdims=True)
        return proj / jnp.maximum(norm, 1e-12)
