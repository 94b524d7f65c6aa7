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


@pytest.fixture(scope="module")
def bert_vocab(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bert_vocab")
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
              "hello", "world", "don", "'", "t", "stop", "he",
              "##llo", "##ll", "##o", "!", ",", "a", "dog", "bark",
              "##ing", "h", "##e"]
    path = tmp / "vocab.txt"
    path.write_text("\n".join(tokens) + "\n")
    return str(path)


def test_wordpiece_matches_hf(bert_vocab):
    """WordPieceTokenizer == HF BertTokenizer from the same vocab.txt
    (reference open_clip/bert.py:1-3 tokenizes the bert branch with
    BertTokenizer('bert-base-uncased'))."""
    from transformers import BertTokenizer

    from lass_tpu.models.clap.tokenizer import WordPieceTokenizer

    hf = BertTokenizer(vocab_file=bert_vocab)
    mine = WordPieceTokenizer(bert_vocab)
    for text in ["hello world", "HeLLo, WORLD!", "don't stop",
                 "héllo world", "a dog barking", "zzz unknown",
                 "  spaces \t and\nnewlines ", "hello " * 30]:
        ref = hf(text, padding="max_length", truncation=True, max_length=16)
        out = mine([text], max_length=16)
        assert out["input_ids"][0].tolist() == ref["input_ids"], text
        assert out["attention_mask"][0].tolist() == \
            ref["attention_mask"], text
        assert out["token_type_ids"][0].tolist() == \
            ref["token_type_ids"], text


def test_bart_tokenizer_matches_hf(vocab_assets):
    """BartBPETokenizer == HF BartTokenizer from the same assets — BART
    ships roberta's byte-BPE with identical specials (reference
    open_clip/bert.py:29-31)."""
    from transformers import BartTokenizer

    from lass_tpu.models.clap.tokenizer import BartBPETokenizer

    vpath, mpath = vocab_assets
    hf = BartTokenizer(vocab_file=vpath, merges_file=mpath)
    mine = BartBPETokenizer(vpath, mpath)
    for text in ["hello world", "hello hello world!", "don't stop"]:
        ref = hf(text, padding="max_length", truncation=True, max_length=24)
        out = mine([text], max_length=24)
        assert out["input_ids"][0].tolist() == ref["input_ids"], text
        assert out["attention_mask"][0].tolist() == \
            ref["attention_mask"], text


def test_tokenizer_env_construction(bert_vocab, vocab_assets, monkeypatch):
    """Env-var construction paths (LASS_TPU_BERT_VOCAB /
    LASS_TPU_BART_VOCAB_DIR) used by CLAPQueryEncoder(tmodel=...)."""
    from lass_tpu.models.clap.tokenizer import (
        BartBPETokenizer, WordPieceTokenizer)

    monkeypatch.setenv("LASS_TPU_BERT_VOCAB", bert_vocab)
    assert WordPieceTokenizer()(["hello"])["input_ids"].shape[0] == 1
    vdir = os.path.dirname(vocab_assets[0])
    monkeypatch.setenv("LASS_TPU_BART_VOCAB_DIR", vdir)
    assert BartBPETokenizer()(["hello"])["input_ids"].shape[0] == 1
    monkeypatch.delenv("LASS_TPU_BERT_VOCAB")
    with pytest.raises(FileNotFoundError):
        WordPieceTokenizer()


def test_fallback_tokenizer_deterministic():
    tok = WhitespaceFallbackTokenizer()
    a = tok(["a dog barking", "rain"])
    b = tok(["a dog barking", "rain"])
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
    assert a["input_ids"].shape[0] == 2
