"""Multi-resolution STFT variant tests (BASELINE config 4 slice)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lass_tpu.dsp.stft import multi_resolution_spectrogram_phase
from lass_tpu.models.film import multistft_film_spec
from lass_tpu.models.resunet_multistft import MultiSTFTResUNet30


WINS = (256, 512, 2048)


def make_inputs(rng, b=1, length=16000):
    wave = jnp.asarray(rng.randn(b, 1, length).astype(np.float32) * 0.1)
    stfts = multi_resolution_spectrogram_phase(wave, WINS)
    return {
        "stft_mixture_mag": {w: stfts[w][0] for w in WINS},
        "stft_mixture_cos": {w: stfts[w][1] for w in WINS},
        "stft_mixture_sin": {w: stfts[w][2] for w in WINS},
        "condition": jnp.asarray(rng.randn(b, 512).astype(np.float32)),
    }, length


def test_film_spec_multistft():
    spec = multistft_film_spec(WINS)
    paths = {p for p, _, _ in spec}
    assert ("encoder_block1s", "512", "conv_block1", "beta1") in paths
    # encoder_block2 consumes the fused 96 channels
    feats = {p: f for p, f, _ in spec}
    assert feats[("encoder_block2", "conv_block1", "beta1")] == 96
    assert feats[("decoder_block6", "conv_block2", "beta1")] == 32 + 96


def test_same_frame_count_across_windows(rng):
    inputs, _ = make_inputs(rng)
    shapes = {w: inputs["stft_mixture_mag"][w].shape for w in WINS}
    assert shapes[256][1] == shapes[512][1] == shapes[2048][1]
    assert shapes[256][2] == 129 and shapes[512][2] == 257 \
        and shapes[2048][2] == 1025


@pytest.fixture(scope="module")
def model_and_vars():
    rng = np.random.RandomState(0)
    model = MultiSTFTResUNet30()
    inputs, length = make_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), inputs, length,
                           train=False)
    return model, variables


def test_forward_and_grads(model_and_vars, rng):
    model, variables = model_and_vars
    inputs, length = make_inputs(rng, b=2)
    out = model.apply(variables, inputs, length, train=False)
    assert out["waveform"].shape == (2, 1, length)
    assert np.isfinite(np.asarray(out["waveform"])).all()

    target = jnp.asarray(rng.randn(2, 1, length).astype(np.float32) * 0.1)

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            inputs, length, train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.abs(o["waveform"] - target))

    grads = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    # every branch contributes
    for w in WINS:
        g = np.asarray(grads[f"pre_conv_{w}"]["kernel"])
        assert np.abs(g).sum() > 0, w
