"""BPE tokenizer parity vs HF RobertaTokenizer built from the same local
vocab assets (no downloads)."""
import json
import os

import numpy as np
import pytest

from lass_tpu.models.clap.tokenizer import (
    RobertaBPETokenizer, WhitespaceFallbackTokenizer, bytes_to_unicode)


@pytest.fixture(scope="module")
def vocab_assets(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vocab")
    b2u = bytes_to_unicode()
    tokens = ["<s>", "<pad>", "</s>", "<unk>"]
    # all single bytes
    tokens += [b2u[b] for b in range(256)]
    # a few merges exercising the ranked-merge loop
    merges = ["h e", "l l", "he ll", "hell o", "Ġ w", "o r", "Ġw or",
              "Ġwor ld"]
    for m in merges:
        tokens.append(m.replace(" ", ""))
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    vpath, mpath = tmp / "vocab.json", tmp / "merges.txt"
    vpath.write_text(json.dumps(vocab))
    mpath.write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(vpath), str(mpath)


def test_bpe_matches_hf(vocab_assets):
    from transformers import RobertaTokenizer

    vpath, mpath = vocab_assets
    hf = RobertaTokenizer(vocab_file=vpath, merges_file=mpath)
    mine = RobertaBPETokenizer(vpath, mpath)
    for text in ["hello world", "hello hello world!", "abc xyz hello",
                 "  spaces   and\ttabs", "don't stop"]:
        ref = hf(text, padding="max_length", truncation=True, max_length=24)
        out = mine([text], max_length=24)
        assert out["input_ids"][0].tolist() == ref["input_ids"], text
        assert out["attention_mask"][0].tolist() == ref["attention_mask"], text


def test_truncation_and_padding(vocab_assets):
    vpath, mpath = vocab_assets
    mine = RobertaBPETokenizer(vpath, mpath)
    out = mine(["hello world " * 50], max_length=16)
    assert out["input_ids"].shape == (1, 16)
    assert out["input_ids"][0, 0] == 0 and out["attention_mask"].sum() == 16

    # dynamic short padding
    out = mine(["hello"], max_length=512, pad_to=8)
    assert out["input_ids"].shape[1] == 8


def test_fallback_tokenizer_deterministic():
    tok = WhitespaceFallbackTokenizer()
    a = tok(["a dog barking", "rain"])
    b = tok(["a dog barking", "rain"])
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
    assert a["input_ids"].shape[0] == 2
