"""ResUNet30 model tests: shapes, gradient flow, FiLM structure, and the
BASELINE.json config-1 slice (STFT->mask->ISTFT on one 10s 16kHz clip with a
fixed query embedding, CPU-runnable)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lass_tpu.models.film import FusedFiLM, resunet30_film_spec
from lass_tpu.models.resunet import ResUNet30


def test_film_spec_matches_reference_meta():
    spec = resunet30_film_spec()
    total = sum(f for _, f, _ in spec)
    used = sum(f for _, f, u in spec if u)
    # enumerated from reference get_film_meta over ResUNet30 (resunet.py:598-618)
    assert used == 8256
    assert total == 8256 + (384 + 384 + 384 + 256 + 128 + 64)
    paths = {p for p, _, _ in spec}
    assert ("encoder_block1", "conv_block1", "beta1") in paths
    assert ("decoder_block6", "conv_block2", "beta2") in paths


def test_fused_film_shapes():
    spec = resunet30_film_spec()
    mod = FusedFiLM(spec, 512)
    cond = jnp.ones((2, 512))
    variables = mod.init(jax.random.PRNGKey(0), cond)
    out = mod.apply(variables, cond)
    assert out["encoder_block1"]["conv_block1"]["beta1"].shape == (2, 32)
    assert out["decoder_block1"]["conv_block2"]["beta1"].shape == (2, 768)
    assert out["conv_block7a"]["conv_block1"]["beta2"].shape == (2, 384)


@pytest.fixture(scope="module")
def small_model_and_vars():
    # 1 s clip => T=101 frames (pads to 128), F=513->512: full code path,
    # small enough for CPU.
    model = ResUNet30()
    x = {
        "mixture": jnp.zeros((1, 1, 16000)),
        "condition": jnp.zeros((1, 512)),
    }
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_forward_shape_and_finiteness(small_model_and_vars, rng):
    model, variables = small_model_and_vars
    x = {
        "mixture": jnp.asarray(rng.randn(2, 1, 16000).astype(np.float32) * 0.1),
        "condition": jnp.asarray(rng.randn(2, 512).astype(np.float32)),
    }
    out = model.apply(variables, x, train=False)
    assert out["waveform"].shape == (2, 1, 16000)
    assert np.isfinite(np.asarray(out["waveform"])).all()
    # masking can only produce bounded output relative to the mixture
    assert np.abs(np.asarray(out["waveform"])).max() < 10.0


def test_forward_train_mode_updates_stats(small_model_and_vars, rng):
    model, variables = small_model_and_vars
    x = {
        "mixture": jnp.asarray(rng.randn(2, 1, 16000).astype(np.float32) * 0.1),
        "condition": jnp.asarray(rng.randn(2, 512).astype(np.float32)),
    }
    out, updated = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    before = variables["batch_stats"]["bn0"]["mean"]
    after = updated["batch_stats"]["bn0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_gradient_flows(small_model_and_vars, rng):
    model, variables = small_model_and_vars
    mixture = jnp.asarray(rng.randn(1, 1, 16000).astype(np.float32) * 0.1)
    cond = jnp.asarray(rng.randn(1, 512).astype(np.float32))
    target = jnp.asarray(rng.randn(1, 1, 16000).astype(np.float32) * 0.1)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            {"mixture": mixture, "condition": cond}, train=True,
            mutable=["batch_stats"])
        return jnp.mean(jnp.abs(out["waveform"] - target))

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    film_g = np.asarray(grads["film"]["kernel"])
    assert np.abs(film_g).sum() > 0  # conditioning actually used


def test_param_count_plausible(small_model_and_vars):
    model, variables = small_model_and_vars
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"]))
    # reference ResUNet30 ~ 25-35M params + fused FiLM ~5M
    assert 20e6 < n < 45e6, n
