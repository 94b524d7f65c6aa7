"""RoBERTa text encoder in JAX/flax (from scratch — no HF flax dependency).

This is the CLAP text branch of the reference
(models/CLAP/open_clip/model.py:517, 658-665: HF RobertaModel
pooler_output -> text_projection). Zero-egress environment means no
pretrained download here; weights come from the checkpoint converter
(lass_tpu/convert). Numerics verified against torch transformers
RobertaModel with random weights in tests/test_roberta.py.

TPU notes: attention uses one fused QKV matmul per layer; sequence length is
static per jit. Because attention is masked, padding to ANY length >= the
true sequence yields identical pooled output, so short-query inference can
pad captions to a small multiple of 64 instead of the reference's fixed 512
(clap_encoder.py:108-116) with bitwise-equal embeddings.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1


class SelfAttention(nn.Module):
    cfg: RobertaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, s, h = x.shape
        nh = cfg.num_attention_heads
        hd = h // nh
        qkv = nn.Dense(3 * h, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, x.dtype))
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
        probs = jax.nn.softmax(scores + bias.astype(scores.dtype), axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h)
        return nn.Dense(h, dtype=self.dtype, name="out")(ctx)


class TransformerLayer(nn.Module):
    cfg: RobertaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        attn = SelfAttention(cfg, self.dtype, name="attention")(x, mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="attention_ln")(x + attn)
        ff = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                      name="intermediate")(x)
        ff = jax.nn.gelu(ff, approximate=False)
        ff = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(ff)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="output_ln")(x + ff)


class RobertaModel(nn.Module):
    """input_ids/attention_mask -> (last_hidden_state, pooler_output)."""

    cfg: RobertaConfig = RobertaConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array):
        cfg = self.cfg
        # roberta position ids: pad_token_id + cumulative index over
        # non-pad tokens (HF create_position_ids_from_input_ids)
        not_pad = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        position_ids = jnp.cumsum(not_pad, axis=1) * not_pad + cfg.pad_token_id

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                        dtype=self.dtype, name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype,
                       name="position_embeddings")(position_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                       dtype=self.dtype, name="token_type_embeddings")(
            jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="embeddings_ln")(word + pos + typ)

        for i in range(cfg.num_hidden_layers):
            x = TransformerLayer(cfg, self.dtype, name=f"layer_{i}")(
                x, attention_mask)

        pooled = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                          name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled
