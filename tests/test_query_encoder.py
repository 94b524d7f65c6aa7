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


def test_audio_path_raises_without_htsat(encoder):
    with pytest.raises(NotImplementedError):
        encoder.get_query_embed("audio", audio=jnp.zeros((1, 32000)))
