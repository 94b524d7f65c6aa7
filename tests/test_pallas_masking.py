"""Pallas fused mask-apply kernel: interpret-mode parity + gradients."""
import numpy as np
import jax
import jax.numpy as jnp

from lass_tpu.ops.pallas_masking import (
    apply_complex_mask, apply_complex_mask_ri, _mask_math_from_ri,
    reference_mask_math)


def make_inputs(rng, shape=(2, 7, 513)):
    return tuple(jnp.asarray(rng.randn(*shape).astype(np.float32))
                 for _ in range(6))


def test_kernel_matches_reference(rng):
    args = make_inputs(rng)
    real, imag = apply_complex_mask(*args, interpret=True)
    ref_r, ref_i = reference_mask_math(*args)
    np.testing.assert_allclose(np.asarray(real), np.asarray(ref_r),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(imag), np.asarray(ref_i),
                               atol=1e-6)


def test_gradients_match_reference(rng):
    args = make_inputs(rng, shape=(1, 3, 130))

    def loss_pallas(*a):
        r, i = apply_complex_mask(*a, interpret=True)
        return jnp.sum(r ** 2 + i * 0.5)

    def loss_ref(*a):
        r, i = reference_mask_math(*a)
        return jnp.sum(r ** 2 + i * 0.5)

    g1 = jax.grad(loss_pallas, argnums=tuple(range(6)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_ri_kernel_matches_reference(rng):
    """The raw-complex variant must equal mag/cos/sin decomposition +
    the original chain."""
    l0, l1, l2, re, im, _ = make_inputs(rng, shape=(2, 5, 257))
    real, imag = apply_complex_mask_ri(l0, l1, l2, re, im, interpret=True)
    mag = jnp.sqrt(jnp.maximum(re**2 + im**2, 1e-10))
    ref_r, ref_i = reference_mask_math(l0, l1, l2, mag, re / mag, im / mag)
    np.testing.assert_allclose(np.asarray(real), np.asarray(ref_r),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(imag), np.asarray(ref_i),
                               atol=1e-6)

    # gradients
    def loss_pallas(*a):
        r, i = apply_complex_mask_ri(*a, interpret=True)
        return jnp.sum(r ** 2 + i * 0.5)

    def loss_ref(*a):
        r, i = _mask_math_from_ri(*a)
        return jnp.sum(r ** 2 + i * 0.5)

    args = (l0[:1, :2, :64], l1[:1, :2, :64], l2[:1, :2, :64],
            re[:1, :2, :64], im[:1, :2, :64])
    g1 = jax.grad(loss_pallas, argnums=tuple(range(5)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_non_divisible_rows(rng):
    # M = 2*7 = 14 rows, far from the 256-row block: padding path
    args = make_inputs(rng, shape=(2, 7, 64))
    real, imag = apply_complex_mask(*args, interpret=True)
    ref_r, _ = reference_mask_math(*args)
    assert real.shape == (2, 7, 64)
    np.testing.assert_allclose(np.asarray(real), np.asarray(ref_r),
                               atol=1e-6)


def test_fused_head_matches_reference(rng):
    from lass_tpu.ops.pallas_masking import (
        apply_head_mask_folded, head_mask_reference)

    b, t, g, c, m = 2, 8, 16, 32, 4
    h = jnp.asarray(rng.randn(b, t, g, c).astype(np.float32))
    ws = [jnp.asarray(rng.randn(c, m).astype(np.float32) * 0.1)
          for _ in range(3)]
    bs = [jnp.asarray(rng.randn(m).astype(np.float32) * 0.1)
          for _ in range(3)]
    re = jnp.asarray(rng.randn(b, t, g, m).astype(np.float32))
    im = jnp.asarray(rng.randn(b, t, g, m).astype(np.float32))

    real, imag = apply_head_mask_folded(
        h, ws[0], ws[1], ws[2], bs[0], bs[1], bs[2], re, im, True)
    ref_r, ref_i = head_mask_reference(
        h, ws[0], ws[1], ws[2], bs[0], bs[1], bs[2], re, im)
    np.testing.assert_allclose(np.asarray(real), np.asarray(ref_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(imag), np.asarray(ref_i),
                               atol=1e-5)

    # gradients flow to activations, weights and biases identically
    def loss_fused(h, w, bias):
        r, i = apply_head_mask_folded(h, w, ws[1], ws[2], bias, bs[1],
                                      bs[2], re, im, True)
        return jnp.sum(r ** 2 + 0.5 * i)

    def loss_ref(h, w, bias):
        r, i = head_mask_reference(h, w, ws[1], ws[2], bias, bs[1],
                                   bs[2], re, im)
        return jnp.sum(r ** 2 + 0.5 * i)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(h, ws[0], bs[0])
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(h, ws[0], bs[0])
    for a, b2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=2e-4, atol=2e-4)


def test_fused_head_model_equivalence(rng):
    """ResUNet30 with the fused head (interpret mode) == the plain folded
    execution, same params, f32."""
    import jax.random as jrandom
    from lass_tpu.models.resunet import ResUNet30

    ex = {"mixture": jnp.asarray(rng.randn(1, 1, 16000).astype(np.float32)
                                 * 0.1),
          "condition": jnp.asarray(rng.randn(1, 512).astype(np.float32))}
    plain = ResUNet30(freq_fold=4, fuse_head=False)
    variables = plain.init(jrandom.PRNGKey(0), ex, train=False)
    want = plain.apply(variables, ex, train=False)["waveform"]
    fused = ResUNet30(freq_fold=4, fuse_head=True)
    got = fused.apply(variables, ex, train=False)["waveform"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
