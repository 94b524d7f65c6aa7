"""CLAP query encoder facade tests (config 2 of BASELINE.json: caption
strings -> 512-d conditioning vector)."""
import numpy as np
import pytest
import jax.numpy as jnp

from lass_tpu.models.clap.roberta import RobertaConfig
from lass_tpu.models.query_encoder import CLAPQueryEncoder

SMALL = RobertaConfig(vocab_size=200, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=80)


@pytest.fixture(scope="module")
def encoder():
    return CLAPQueryEncoder(roberta_cfg=SMALL, rng_seed=0)


def test_text_embed_shape_and_norm(encoder):
    out = encoder.get_query_embed("text", text=["a dog barking",
                                                "heavy rain on a roof"])
    assert out.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               np.ones(2), atol=1e-5)


def test_single_caption_no_doubling_hack(encoder):
    """Reference doubles batch-of-1 inputs (clap_encoder.py:79-88); ours
    must produce the same embedding for a caption alone or in a batch."""
    single = np.asarray(encoder.get_query_embed("text", text=["a dog"]))
    batch = np.asarray(encoder.get_query_embed("text",
                                               text=["a dog", "a cat"]))
    np.testing.assert_allclose(single[0], batch[0], atol=1e-5)


def test_hybrid_text_only_when_ratio_1(encoder):
    # use_text_ratio=1.0 (baseline config) must always take the text branch
    for s in range(5):
        out = encoder.get_query_embed("hybird", text=["x"], audio=None,
                                      use_text_ratio=1.0, seed=s)
        assert out.shape == (1, 512)


def test_text_embed_cache_bit_exact(encoder):
    """The per-caption LRU (frozen-encoder memoization) must return
    BIT-identical embeddings to recomputation, in any batch order."""
    fresh = CLAPQueryEncoder(roberta_cfg=SMALL, rng_seed=0,
                             text_embed_cache=0)
    texts = ["a dog barking", "heavy rain on a roof", "a violin"]
    warm = np.asarray(encoder.get_query_embed("text", text=texts))
    h0 = encoder.embed_cache_hits
    # full-hit assembly, permuted order
    perm = [texts[2], texts[0], texts[1]]
    cached = np.asarray(encoder.get_query_embed("text", text=perm))
    assert encoder.embed_cache_hits == h0 + 1
    uncached = np.asarray(fresh.get_query_embed("text", text=perm))
    np.testing.assert_array_equal(cached, warm[[2, 0, 1]])
    np.testing.assert_allclose(cached, uncached, atol=1e-6)


def test_text_embed_cache_eviction_and_disable():
    enc = CLAPQueryEncoder(roberta_cfg=SMALL, rng_seed=0,
                           text_embed_cache=2)
    enc.get_query_embed("text", text=["t0", "t1", "t2"])  # 3 > capacity 2
    assert len(enc._embed_cache) == 2 and "t0" not in enc._embed_cache
    off = CLAPQueryEncoder(roberta_cfg=SMALL, rng_seed=0,
                           text_embed_cache=0)
    off.get_query_embed("text", text=["t0"])
    assert not off._embed_cache and off.embed_cache_misses == 0


def test_audio_path_raises_without_htsat(encoder):
    with pytest.raises(NotImplementedError):
        encoder.get_query_embed("audio", audio=jnp.zeros((1, 32000)))


@pytest.mark.parametrize("tmodel", ["bert", "bart"])
def test_tmodel_branches_end_to_end(tmodel, tmp_path):
    """tmodel='bert'/'bart' select the matching text branch + host
    tokenizer (reference --tmodel, open_clip/bert.py) — captions in,
    normalized (B, 512) out."""
    from lass_tpu.models.clap.bert import BartConfig, BertConfig
    from lass_tpu.models.clap.tokenizer import (
        BartBPETokenizer, WordPieceTokenizer, bytes_to_unicode)

    if tmodel == "bert":
        vocab = tmp_path / "vocab.txt"
        vocab.write_text("\n".join(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "dog", "rain"]) + "\n")
        tok = WordPieceTokenizer(str(vocab))
        cfg = BertConfig(vocab_size=16, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=64,
                         max_position_embeddings=80)
    else:
        import json as _json

        b2u = bytes_to_unicode()
        tokens = ["<s>", "<pad>", "</s>", "<unk>"]
        tokens += [b2u[b] for b in range(256)]
        (tmp_path / "vocab.json").write_text(
            _json.dumps({t: i for i, t in enumerate(tokens)}))
        (tmp_path / "merges.txt").write_text("#version: 0.2\n")
        tok = BartBPETokenizer(str(tmp_path / "vocab.json"),
                               str(tmp_path / "merges.txt"))
        cfg = BartConfig(vocab_size=300, hidden_size=32,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=64, max_position_embeddings=80)
    enc = CLAPQueryEncoder(tmodel=tmodel, text_cfg=cfg, tokenizer=tok,
                           pad_to=16)
    out = enc.get_query_embed("text", text=["a dog", "rain"])
    assert out.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               np.ones(2), atol=1e-5)


def test_from_npz_text_pack(tmp_path):
    """CLAPQueryEncoder.from_npz loads a converted text-branch pack and
    reproduces the source model's embeddings."""
    import jax
    import numpy as np

    from lass_tpu.models.clap.model import CLAPTextEncoder

    enc_model = CLAPTextEncoder(SMALL)
    ids = jnp.asarray([[0, 7, 9, 2]], jnp.int32)
    params = enc_model.init(jax.random.PRNGKey(1), ids,
                            jnp.ones_like(ids))["params"]
    ref = np.asarray(enc_model.apply({"params": params}, ids,
                                     jnp.ones_like(ids)))

    # write the pack the way scripts/convert_checkpoint.py does
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "convert_ckpt", "scripts/convert_checkpoint.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    payload = {f"text/params/{k}": v
               for k, v in mod.flatten(
                   jax.tree_util.tree_map(np.asarray, params)).items()}
    pack = tmp_path / "clap.npz"
    np.savez(pack, **payload)

    enc = CLAPQueryEncoder.from_npz(str(pack), roberta_cfg=SMALL)
    # embed via the raw jit path with the same ids
    out = np.asarray(enc._jit_text(enc.text_params, ids,
                                   jnp.ones_like(ids)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_random_weights_warning(caplog):
    """Building without pretrained text weights must emit a prominent
    warning (silent random-conditioning trap, train/loop.py default)."""
    import logging

    with caplog.at_level(logging.WARNING, logger="lass_tpu.query_encoder"):
        enc = CLAPQueryEncoder(roberta_cfg=SMALL)
    assert not enc.has_pretrained_text
    assert any("WITHOUT pretrained text weights" in r.message
               for r in caplog.records)


def test_no_warning_with_pretrained_params(caplog):
    import logging

    base = CLAPQueryEncoder(roberta_cfg=SMALL)
    with caplog.at_level(logging.WARNING, logger="lass_tpu.query_encoder"):
        caplog.clear()
        enc = CLAPQueryEncoder(text_params=base.text_params,
                               tokenizer=base.tokenizer, roberta_cfg=SMALL)
    assert enc.has_pretrained_text
    assert not any("WITHOUT pretrained" in r.message for r in caplog.records)
