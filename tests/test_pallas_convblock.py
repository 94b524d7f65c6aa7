"""Fused residual conv-block Pallas kernel vs the plain folded block."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lass_tpu.ops.folded import fold_conv_kernel, fold_feature_map
from lass_tpu.ops.pallas_convblock import fused_residual_conv_block


def reference_block(x, w1f, w2f, a1, b1, a2, b2):
    def leaky(v):
        return jnp.maximum(v, 0.01 * v)

    def conv(h, w):
        return jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    h1 = leaky(x * a1[:, None, None, :] + b1[:, None, None, :])
    y1 = conv(h1, w1f)
    h2 = leaky(y1 * a2[:, None, None, :] + b2[:, None, None, :])
    return x + conv(h2, w2f)


@pytest.mark.parametrize("t,g,u", [(64, 16, 16), (96, 8, 8)])
def test_fused_block_matches_reference(t, g, u, rng):
    b = 2
    x = jnp.asarray(rng.randn(b, t, g, u).astype(np.float32) * 0.3)
    w1 = jnp.asarray((rng.randn(3, 3, u, u) * 0.1).astype(np.float32))
    w2 = jnp.asarray((rng.randn(3, 3, u, u) * 0.1).astype(np.float32))
    a1 = jnp.asarray((rng.rand(b, u) * 0.5 + 0.7).astype(np.float32))
    b1 = jnp.asarray((rng.randn(b, u) * 0.2).astype(np.float32))
    a2 = jnp.asarray((rng.rand(b, u) * 0.5 + 0.7).astype(np.float32))
    b2 = jnp.asarray((rng.randn(b, u) * 0.2).astype(np.float32))

    ref = reference_block(x, w1, w2, a1, b1, a2, b2)
    out = fused_residual_conv_block(x, w1, w2, a1, b1, a2, b2, t_tile=32,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_folded_block_with_real_fold(rng):
    """Folded kernels + fused block == unfolded reference conv block
    (completing the end-to-end equivalence chain used by the model)."""
    from lass_tpu.ops.folded import fold_freq, unfold_freq

    s, c = 4, 8
    b, t, f = 1, 32, 32
    x = jnp.asarray(rng.randn(b, t, f, c).astype(np.float32) * 0.3)
    w1 = jnp.asarray((rng.randn(3, 3, c, c) * 0.1).astype(np.float32))
    w2 = jnp.asarray((rng.randn(3, 3, c, c) * 0.1).astype(np.float32))
    fm = fold_feature_map(s, [c])
    a1l = (rng.rand(c) * 0.5 + 0.7).astype(np.float32)
    b1l = (rng.randn(c) * 0.2).astype(np.float32)
    a2l = (rng.rand(c) * 0.5 + 0.7).astype(np.float32)
    b2l = (rng.randn(c) * 0.2).astype(np.float32)

    def leaky(v):
        return jnp.maximum(v, 0.01 * v)

    def conv(h, w):
        return jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    h1 = leaky(x * a1l + b1l)
    y1 = conv(h1, w1)
    h2 = leaky(y1 * a2l + b2l)
    ref = x + conv(h2, w2)

    xf = fold_freq(x, s)
    out = fused_residual_conv_block(
        xf, fold_conv_kernel(w1, s), fold_conv_kernel(w2, s),
        jnp.asarray(a1l[fm])[None], jnp.asarray(b1l[fm])[None],
        jnp.asarray(a2l[fm])[None], jnp.asarray(b2l[fm])[None],
        t_tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(unfold_freq(out, s)),
                               np.asarray(ref), atol=2e-5)
