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
