"""Chunked long-audio inference tests (reference resunet.py:655-714)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lass_tpu.models.chunk import (
    ChunkConfig, chunk_inference, chunk_inference_device)


def scaling_apply_fn(input_dict):
    """Stub separator: output = 0.5 * mixture (condition-independent), so
    the stitched result is exactly checkable."""
    return input_dict["mixture"] * 0.5


CFG = ChunkConfig(NL=0.1, NC=0.3, NR=0.1, RATE=1000)  # 100/300/100 samples


def test_short_input_single_pass(rng):
    x = jnp.asarray(rng.randn(1, 1, 400).astype(np.float32))
    out = chunk_inference(scaling_apply_fn, x, jnp.zeros((1, 512)), CFG)
    assert out.shape == (1, 400)
    np.testing.assert_allclose(out, np.asarray(x)[:, 0] * 0.5, atol=1e-6)


def test_long_input_stitching(rng):
    length = 2050
    x = jnp.asarray(rng.randn(1, 1, length).astype(np.float32))
    out = chunk_inference(scaling_apply_fn, x, jnp.zeros((1, 512)), CFG,
                          max_batch=3)
    assert out.shape == (1, length)
    # the stub is linear and windowing covers every sample -> exact halves
    np.testing.assert_allclose(out, np.asarray(x)[:, 0] * 0.5, atol=1e-6)


@pytest.mark.parametrize("length,max_batch", [(400, 3), (2050, 3),
                                              (2050, 16), (1700, 2)])
def test_device_chunking_matches_numpy_oracle(rng, length, max_batch):
    """The one-jit device path (split + lax.map groups + reshape stitch)
    must equal the host-stitch oracle bit-for-bit."""
    x = jnp.asarray(rng.randn(1, 1, length).astype(np.float32))
    cond = jnp.asarray(rng.randn(1, 512).astype(np.float32))
    oracle = chunk_inference(scaling_apply_fn, x, cond, CFG,
                             max_batch=max_batch)
    got = chunk_inference_device(scaling_apply_fn, x, cond, CFG,
                                 max_batch=max_batch)
    assert got.shape == (1, length)
    np.testing.assert_array_equal(np.asarray(got), oracle)


def test_separate_long_uses_device_path(rng):
    """SeparationInference.separate_long routes through the device path
    (mesh=None) and matches the oracle on a real (tiny) model."""
    from lass_tpu.evaluation.dcase import SeparationInference
    from lass_tpu.models.resunet import ResUNet30

    model = ResUNet30(freq_fold=1)
    cfg = ChunkConfig(NL=0.1, NC=0.2, NR=0.1, RATE=16000)
    length = 16000
    x = rng.randn(1, 1, length).astype(np.float32) * 0.1
    cond = rng.randn(1, 512).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0),
        {"mixture": jnp.asarray(x), "condition": jnp.asarray(cond)},
        train=False)

    def apply_fn(d):
        return model.apply(variables, d, train=False)["waveform"]

    oracle = chunk_inference(apply_fn, jnp.asarray(x), jnp.asarray(cond),
                             cfg, max_batch=2)
    infer = SeparationInference(model, variables, query_encoder=None)
    got = infer.separate_long(x, cond, chunk_cfg=cfg, max_batch=2)
    np.testing.assert_allclose(got, oracle, atol=1e-5)


def test_full_model_chunked_matches_direct(rng):
    """For a REAL model, chunked output must equal direct separation away
    from chunk boundaries (conv/STFT context differs only near edges)."""
    from lass_tpu.models.resunet import ResUNet30

    model = ResUNet30(freq_fold=1)
    length = 48000  # 3 windows at 1s+3s+1s/16k ... window=5s>3s: single pass
    cfg = ChunkConfig(NL=0.5, NC=1.0, NR=0.5, RATE=16000)
    x = {"mixture": jnp.asarray(
        rng.randn(1, 1, length).astype(np.float32) * 0.1),
        "condition": jnp.asarray(rng.randn(1, 512).astype(np.float32))}
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def apply_fn(d):
        return model.apply(variables, d, train=False)["waveform"]

    direct = np.asarray(apply_fn(x))[:, 0]
    chunked = chunk_inference(apply_fn, x["mixture"], x["condition"], cfg)
    assert chunked.shape == (1, length)
    # compare the interior of a central chunk (away from stitch boundaries)
    sl = slice(20000, 24000)
    err = np.abs(chunked[0, sl] - direct[0, sl]).max()
    scale = np.abs(direct[0, sl]).max() + 1e-9
    assert err / scale < 0.35  # same content, modest boundary-context drift
