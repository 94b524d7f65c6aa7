"""PANN Cnn14 (CLAP audio-branch alternative) tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lass_tpu.dsp.mel import LogMelConfig
from lass_tpu.models.clap.pann import Cnn14, PANNConfig


@pytest.fixture(scope="module")
def tiny_cnn14():
    cfg = PANNConfig(mel=LogMelConfig(sample_rate=16000, n_fft=256,
                                      hop_length=160, n_mels=64))
    model = Cnn14(cfg)
    wave = jnp.zeros((1, 16000))
    variables = model.init(jax.random.PRNGKey(0), wave, train=False)
    return cfg, model, variables


def test_cnn14_forward(tiny_cnn14, rng):
    cfg, model, variables = tiny_cnn14
    wave = jnp.asarray(rng.randn(2, 16000).astype(np.float32) * 0.1)
    out = model.apply(variables, wave, train=False)
    assert out["embedding"].shape == (2, 2048)
    assert out["clipwise_output"].shape == (2, 527)
    assert np.isfinite(np.asarray(out["embedding"])).all()
    probs = np.asarray(out["clipwise_output"])
    assert (probs >= 0).all() and (probs <= 1).all()


def test_cnn14_train_mode_dropout(tiny_cnn14, rng):
    cfg, model, variables = tiny_cnn14
    wave = jnp.asarray(rng.randn(1, 16000).astype(np.float32) * 0.1)
    out1, _ = model.apply(variables, wave, train=True,
                          mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(1),
                                "specaug": jax.random.PRNGKey(5)})
    out2, _ = model.apply(variables, wave, train=True,
                          mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(2),
                                "specaug": jax.random.PRNGKey(5)})
    assert not np.allclose(np.asarray(out1["embedding"]),
                           np.asarray(out2["embedding"]))


def test_cnn14_numeric_golden():
    """Fixed-seed forward vs a committed CPU float32 golden
    (scripts/make_pann_golden.py) — catches NUMERIC regressions in a
    refactor that keeps shapes, which the other tests here cannot; full
    reference parity lives in tests/test_reference_parity.py."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden", "pann_cnn14.npz")
    golden = np.load(path)
    cfg = PANNConfig(mel=LogMelConfig(sample_rate=16000, n_fft=256,
                                      hop_length=160, n_mels=64))
    model = Cnn14(cfg)
    r = np.random.RandomState(7)
    wave = jnp.asarray(r.randn(2, 16000).astype(np.float32) * 0.1)
    variables = model.init(jax.random.PRNGKey(0), wave[:1], train=False)
    out = model.apply(variables, wave, train=False)
    np.testing.assert_allclose(
        np.asarray(out["embedding"], np.float32)[:, ::64],
        golden["embedding_head"], rtol=0, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out["clipwise_output"], np.float32)[:, ::16],
        golden["clipwise_head"], rtol=0, atol=2e-5)


def test_cnn10_cnn6_forward(rng):
    from lass_tpu.models.clap.pann import Cnn6, Cnn10

    cfg = PANNConfig(mel=LogMelConfig(sample_rate=16000, n_fft=256,
                                      hop_length=160, n_mels=64))
    wave = jnp.asarray(rng.randn(1, 16000).astype(np.float32) * 0.1)
    for factory, dim in [(Cnn10, 1024), (Cnn6, 512)]:
        model = factory(cfg)
        variables = model.init(jax.random.PRNGKey(0), wave, train=False)
        out = model.apply(variables, wave, train=False)
        assert out["embedding"].shape == (1, dim)
        assert out["clipwise_output"].shape == (1, 527)
        assert np.isfinite(np.asarray(out["fine_grained_embedding"])).all()
