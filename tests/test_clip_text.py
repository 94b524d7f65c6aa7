"""CLIP text branch: tokenizer (synthetic vocab) + causal transformer."""
import gzip

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lass_tpu.models.clap.clip_text import CLIPTextTransformer, CLIPTokenizer
from lass_tpu.models.clap.tokenizer import bytes_to_unicode


@pytest.fixture(scope="module")
def bpe_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clipbpe")
    merges = ["h e", "he l", "hel l", "hell o</w>", "w o", "wo r",
              "wor l", "worl d</w>"]
    path = tmp / "bpe.txt.gz"
    # header line + merges (the loader skips line 0)
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version\n" + "\n".join(merges) + "\n")
    return str(path)


def test_tokenizer_merges_and_specials(bpe_path):
    tok = CLIPTokenizer(bpe_path)
    ids = tok(["hello world", "hello"])
    assert ids.shape == (2, 77)
    assert (ids[:, 0] == tok.sot).all()
    # fully merged tokens present
    assert tok.encoder["hello</w>"] in ids[0]
    assert tok.encoder["world</w>"] in ids[0]
    eot_pos = (ids[0] == tok.eot).argmax()
    assert eot_pos == 3  # sot, hello, world, eot


def test_ascii_fallback_pattern_matches_unicode_pattern():
    """The plain-`re` fallback regex must tokenize ASCII text identically to
    the `regex`-module unicode pattern (it is what ships when `regex` is
    absent)."""
    import re

    regex = pytest.importorskip("regex")
    from lass_tpu.models.clap.clip_text import (
        CLIP_PAT_ASCII, CLIP_PAT_UNICODE)

    uni = regex.compile(CLIP_PAT_UNICODE, regex.IGNORECASE)
    asc = re.compile(CLIP_PAT_ASCII, re.IGNORECASE)
    corpus = [
        "hello world", "it's 2024, isn't it?!", "<|startoftext|>a b<|endoftext|>",
        "MIXED Case-Words... 123 #tags @x", "don't; we'll---see:42",
    ]
    for text in corpus:
        assert uni.findall(text) == asc.findall(text), text


def test_clip_transformer_forward_and_causality(rng):
    model = CLIPTextTransformer(vocab_size=100, width=16, heads=2, layers=2,
                                context_length=12)
    ids = jnp.asarray(rng.randint(1, 90, size=(2, 12)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(variables, ids)
    assert out.shape == (2, 16)

    # causality: changing tokens AFTER the pooled (max-id) position must
    # not change the pooled output
    ids_np = np.asarray(ids).copy()
    ids_np[0, 5] = 99  # make position 5 the argmax/eot
    base = model.apply(variables, jnp.asarray(ids_np))
    ids_np2 = ids_np.copy()
    ids_np2[0, 9] = 42  # later token changes
    out2 = model.apply(variables, jnp.asarray(ids_np2))
    np.testing.assert_allclose(np.asarray(base[0]), np.asarray(out2[0]),
                               atol=1e-6)
