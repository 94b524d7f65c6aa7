"""Attentional feature fusion + mel-fusion feature tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lass_tpu.models.clap.fusion import AFF, DAF, iAFF, build_mel_fusion


@pytest.mark.parametrize("cls", [AFF, iAFF])
def test_fusion_blocks(cls, rng):
    mod = cls(channels=8)
    x = jnp.asarray(rng.randn(2, 5, 6, 8).astype(np.float32))
    r = jnp.asarray(rng.randn(2, 5, 6, 8).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, r)
    out = mod.apply(variables, x, r, train=False)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # 1D input (B, T, C) also works
    x1 = jnp.asarray(rng.randn(2, 10, 8).astype(np.float32))
    v1 = mod.init(jax.random.PRNGKey(1), x1, x1)
    assert mod.apply(v1, x1, x1, train=False).shape == x1.shape


def test_daf():
    x = jnp.ones((1, 2, 3))
    out = DAF().apply({}, x, 2 * x)
    np.testing.assert_allclose(np.asarray(out), 3.0)


def test_build_mel_fusion_long(rng):
    import pytest

    torch = pytest.importorskip("torch")

    mel = rng.randn(1000, 64).astype(np.float32)
    stack, longer = build_mel_fusion(mel, 301, np.random.default_rng(0))
    assert stack.shape == (4, 301, 64) and longer
    # global shrink == torchvision Resize semantics (bilinear,
    # align_corners=False, no antialias — training/data.py:507 with the
    # reference's torchvision 0.14)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(mel)[None, None], size=(301, 64), mode="bilinear",
        align_corners=False)[0, 0].numpy()
    # atol 1e-3: torch's kernel computes sample positions in f32; ours in
    # f64 — sub-1e-3 differences on O(1) values
    np.testing.assert_allclose(stack[3], want, atol=1e-3)


def test_build_mel_fusion_corner_case(rng):
    mel = rng.randn(100, 64).astype(np.float32)
    stack, longer = build_mel_fusion(mel, 100)
    assert stack.shape == (4, 100, 64) and not longer
    np.testing.assert_array_equal(stack[0], mel)
