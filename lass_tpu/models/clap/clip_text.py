"""CLIP-style text branch: byte-BPE tokenizer + causal transformer.

Behavioral spec: the reference CLAP's 'transformer' text branch
(open_clip/model.py:475-496: token_embedding + positional_embedding +
causal Transformer + ln_final + eot-token pooling at argmax(ids)) and the
SimpleTokenizer over the bundled BPE vocab (open_clip/tokenizer.py:74-197,
49408 tokens, '</w>' end-of-word markers, 77-token context). The roberta
branch is what LASS uses; this one completes the CLAP text-branch options
that are implementable offline (bert/bart require HF downloads).

Vocab asset: the standard CLIP `bpe_simple_vocab_16e6.txt.gz` supplied by
the user (path argument or LASS_TPU_CLIP_BPE_PATH).
"""
from __future__ import annotations

import gzip
import html
import os
from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lass_tpu.models.clap.tokenizer import bytes_to_unicode

try:
    import regex as _re
except ImportError:  # pragma: no cover
    import re as _re

try:
    import ftfy as _ftfy
except ImportError:
    _ftfy = None


# Unicode pattern (needs the `regex` module for \p classes) and an ASCII
# fallback for plain `re`; identical on ASCII input (tests/test_clip_text.py).
CLIP_PAT_UNICODE = (
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
    r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""")
CLIP_PAT_ASCII = (
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
    r"""[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]+""")

_CLIP_PAT = _re.compile(
    CLIP_PAT_UNICODE if hasattr(_re, "DEFAULT_VERSION") else CLIP_PAT_ASCII,
    _re.IGNORECASE)


def _clean(text: str) -> str:
    if _ftfy is not None:
        text = _ftfy.fix_text(text)
    text = html.unescape(html.unescape(text))
    text = _re.sub(r"\s+", " ", text)
    return text.strip().lower()


class CLIPTokenizer:
    """SimpleTokenizer (open_clip/tokenizer.py:74-164)."""

    def __init__(self, bpe_path: Optional[str] = None):
        bpe_path = bpe_path or os.environ.get("LASS_TPU_CLIP_BPE_PATH")
        if bpe_path is None:
            raise FileNotFoundError(
                "CLIP BPE vocab required: pass bpe_path or set "
                "LASS_TPU_CLIP_BPE_PATH")
        merges = gzip.open(bpe_path, "rt", encoding="utf-8"
                           ).read().split("\n")[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {t: i for i, t in enumerate(vocab)}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = bytes_to_unicode()
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self._cache: Dict[str, List[str]] = {}

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = list(token[:-1]) + [token[-1] + "</w>"]
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged, i = [], 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        self._cache[token] = word
        return word

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for chunk in _CLIP_PAT.findall(_clean(text)):
            mapped = "".join(self.byte_encoder[b]
                             for b in chunk.encode("utf-8"))
            ids.extend(self.encoder[p] for p in self._bpe(mapped)
                       if p in self.encoder)
        return ids

    def __call__(self, texts: Sequence[str], context_length: int = 77
                 ) -> np.ndarray:
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot] + self.encode(t)[:context_length - 2] + [self.eot]
            out[i, :len(ids)] = ids
        return out


class CLIPTextTransformer(nn.Module):
    """token ids (B, 77) -> pooled eot representation (B, width) with
    causal attention (model.py:475-496, :640-645)."""

    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    context_length: int = 77
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        b, s = ids.shape
        x = nn.Embed(self.vocab_size, self.width,
                     name="token_embedding")(ids)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = x + pos[None, :s]
        causal = jnp.tril(jnp.ones((s, s), bool))
        for i in range(self.layers):
            h = nn.LayerNorm(name=f"ln_1_{i}")(x)
            attn = nn.SelfAttention(
                num_heads=self.heads, qkv_features=self.width,
                dtype=self.dtype, name=f"attn_{i}")(
                h, mask=causal[None, None])
            x = x + attn
            h = nn.LayerNorm(name=f"ln_2_{i}")(x)
            h = nn.Dense(self.width * 4, name=f"mlp_fc_{i}")(h)
            h = h * jax.nn.sigmoid(1.702 * h)  # quickgelu (CLIP)
            h = nn.Dense(self.width, name=f"mlp_proj_{i}")(h)
            x = x + h
        x = nn.LayerNorm(name="ln_final")(x)
        # pool at the eot token == highest id per sequence (model.py:644)
        eot_pos = jnp.argmax(ids, axis=-1)
        return x[jnp.arange(b), eot_pos]
