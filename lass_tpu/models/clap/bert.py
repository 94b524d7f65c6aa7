"""BERT and BART-encoder text branches for CLAP.

The reference CLAP selects among transformer/bert/roberta/bart text
branches (models/CLAP/open_clip/model.py:475-549); encode_text uses BERT's
``pooler_output`` and the mean over BART's ``encoder_last_hidden_state``
(model.py:644-676). roberta ships in roberta.py; this module adds the two
remaining HF branches, built from the same post-LN transformer layer
(lass_tpu.models.clap.roberta.TransformerLayer — BERT and the BART encoder
share its exact structure: fused-QKV self-attention, post-residual
LayerNorms, exact GELU).

Zero-egress: weights come from the checkpoint converter
(lass_tpu/convert/torch_to_jax.py convert_hf_bert_state /
convert_hf_bart_encoder_state); numerics are verified against random-weight
torch transformers models in tests/test_bert.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lass_tpu.models.clap.roberta import TransformerLayer


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """bert-base-uncased defaults (model.py:503 BertModel.from_pretrained)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0


class BertModel(nn.Module):
    """input_ids/attention_mask[/token_type_ids] ->
    (last_hidden_state, pooler_output).

    Differs from RobertaModel only in the embedding semantics: position
    ids are a plain ``arange`` (no pad-offset cumsum) and token_type_ids
    are caller-supplied (the reference feeds the tokenizer's, which are
    zeros for single-caption input — model.py:646-656)."""

    cfg: BertConfig = BertConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 token_type_ids: Optional[jax.Array] = None):
        cfg = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        position_ids = jnp.broadcast_to(
            jnp.arange(input_ids.shape[1])[None], input_ids.shape)

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                        dtype=self.dtype, name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype,
                       name="position_embeddings")(position_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                       dtype=self.dtype, name="token_type_embeddings")(
            token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="embeddings_ln")(word + pos + typ)

        for i in range(cfg.num_hidden_layers):
            x = TransformerLayer(cfg, self.dtype, name=f"layer_{i}")(
                x, attention_mask)

        pooled = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                          name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled


@dataclasses.dataclass(frozen=True)
class BartConfig:
    """facebook/bart-base encoder defaults (model.py:533
    BartModel.from_pretrained). Field names follow BertConfig so
    TransformerLayer can consume either config."""

    vocab_size: int = 50265
    hidden_size: int = 768  # d_model
    num_hidden_layers: int = 6  # encoder_layers
    num_attention_heads: int = 12
    intermediate_size: int = 3072  # encoder_ffn_dim
    max_position_embeddings: int = 1024
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    position_offset: int = 2  # HF BartLearnedPositionalEmbedding offset


class BartEncoderModel(nn.Module):
    """input_ids/attention_mask -> encoder last_hidden_state (B, S, H).

    HF BartEncoder semantics: token embeddings (scale 1.0 for bart-base)
    + learned positions at ``arange + offset`` (padding-independent),
    layernorm_embedding, then post-LN transformer layers — structurally
    the BERT layer, so TransformerLayer is reused and only the converter
    name-mapping differs."""

    cfg: BartConfig = BartConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array
                 ) -> jax.Array:
        cfg = self.cfg
        position_ids = jnp.broadcast_to(
            jnp.arange(input_ids.shape[1])[None] + cfg.position_offset,
            input_ids.shape)
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                        dtype=self.dtype, name="embed_tokens")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings + cfg.position_offset,
                       cfg.hidden_size, dtype=self.dtype,
                       name="embed_positions")(position_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layernorm_embedding")(word + pos)
        for i in range(cfg.num_hidden_layers):
            x = TransformerLayer(cfg, self.dtype, name=f"layer_{i}")(
                x, attention_mask)
        return x
