"""Fused Pallas TPU kernel for the K=3 complex-mask apply + phase rotation.

The mask application (reference resunet.py:469-496: sigmoid magnitude mask,
tanh real/imag -> magphase normalization, phase rotation against the
mixture phase, relu magnitude) is a chain of ~14 elementwise ops over
(B, T, F) f32 arrays sandwiched between the UNet output and the ISTFT
matmul. This kernel computes the whole chain in ONE VMEM pass per tile:
six (B*T, F) inputs stream HBM->VMEM once and two outputs stream back,
instead of XLA's fusion-boundary traffic around the sigmoid/tanh/rsqrt
cluster.

The op is differentiable: forward runs the Pallas kernel, backward uses
jax.vjp of the identical jnp formula (mask math is cheap relative to the
convs, so recomputation is free in practice).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BLOCK_ROWS = 256


def _mask_math(l_mag, l_real, l_imag, mag, cos_in, sin_in):
    mask_mag = jax.nn.sigmoid(l_mag)
    mr = jnp.tanh(l_real)
    mi = jnp.tanh(l_imag)
    denom = jnp.maximum(jnp.sqrt(mr * mr + mi * mi), 1e-10)
    mask_cos = mr / denom
    mask_sin = mi / denom
    out_cos = cos_in * mask_cos - sin_in * mask_sin
    out_sin = sin_in * mask_cos + cos_in * mask_sin
    out_mag = jax.nn.relu(mag * mask_mag)
    return out_mag * out_cos, out_mag * out_sin


def _mask_math_from_ri(l_mag, l_real, l_imag, real_in, imag_in,
                       eps: float = 1e-10):
    """Same chain but deriving mag/cos/sin from the raw complex spectrum
    inside the kernel (reference base.py:83-88 semantics: power clamped at
    eps before the sqrt), so cos/sin never hit HBM."""
    mag = jnp.sqrt(jnp.maximum(real_in * real_in + imag_in * imag_in, eps))
    return _mask_math(l_mag, l_real, l_imag, mag, real_in / mag,
                      imag_in / mag)


def _kernel_ri(lm_ref, lr_ref, li_ref, re_ref, im_ref, real_ref, imag_ref):
    real, imag = _mask_math_from_ri(lm_ref[:], lr_ref[:], li_ref[:],
                                    re_ref[:], im_ref[:])
    real_ref[:] = real
    imag_ref[:] = imag


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def apply_complex_mask_ri(l_mag, l_real, l_imag, real_in, imag_in,
                          interpret: bool = False):
    """(..., F) x5 -> (real, imag): fused mask apply taking the raw STFT
    real/imag (mag/cos/sin computed in-VMEM)."""
    return _pallas_forward_ri(l_mag, l_real, l_imag, real_in, imag_in,
                              interpret)


def _pallas_forward_ri(l_mag, l_real, l_imag, real_in, imag_in, interpret):
    shape = l_mag.shape
    f = shape[-1]
    m = 1
    for d in shape[:-1]:
        m *= d
    args = [a.astype(jnp.float32).reshape(m, f)
            for a in (l_mag, l_real, l_imag, real_in, imag_in)]
    rows = _BLOCK_ROWS
    pad = (-m) % rows
    if pad:
        args = [jnp.pad(a, ((0, pad), (0, 0))) for a in args]
    grid = ((m + pad) // rows,)
    spec = pl.BlockSpec((rows, f), lambda i: (i, 0))
    real, imag = pl.pallas_call(
        _kernel_ri,
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((m + pad, f), jnp.float32),
                   jax.ShapeDtypeStruct((m + pad, f), jnp.float32)),
        interpret=interpret,
    )(*args)
    return real[:m].reshape(shape), imag[:m].reshape(shape)


def _fwd_ri(l_mag, l_real, l_imag, real_in, imag_in, interpret):
    out = _pallas_forward_ri(l_mag, l_real, l_imag, real_in, imag_in,
                             interpret)
    return out, (l_mag, l_real, l_imag, real_in, imag_in)


def _bwd_ri(interpret, residuals, cotangents):
    del interpret
    _, vjp_fn = jax.vjp(lambda *a: _mask_math_from_ri(*a), *residuals)
    return vjp_fn(cotangents)


apply_complex_mask_ri.defvjp(_fwd_ri, _bwd_ri)


def _kernel(lm_ref, lr_ref, li_ref, mag_ref, cos_ref, sin_ref,
            real_ref, imag_ref):
    real, imag = _mask_math(lm_ref[:], lr_ref[:], li_ref[:], mag_ref[:],
                            cos_ref[:], sin_ref[:])
    real_ref[:] = real
    imag_ref[:] = imag


def _pallas_forward(l_mag, l_real, l_imag, mag, cos_in, sin_in,
                    interpret: bool):
    shape = l_mag.shape
    f = shape[-1]
    m = 1
    for d in shape[:-1]:
        m *= d
    args = [a.astype(jnp.float32).reshape(m, f)
            for a in (l_mag, l_real, l_imag, mag, cos_in, sin_in)]
    rows = _BLOCK_ROWS
    pad = (-m) % rows
    if pad:
        args = [jnp.pad(a, ((0, pad), (0, 0))) for a in args]
    grid = ((m + pad) // rows,)
    spec = pl.BlockSpec((rows, f), lambda i: (i, 0))
    real, imag = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec] * 6,
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((m + pad, f), jnp.float32),
                   jax.ShapeDtypeStruct((m + pad, f), jnp.float32)),
        interpret=interpret,
    )(*args)
    return real[:m].reshape(shape), imag[:m].reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def apply_complex_mask(l_mag, l_real, l_imag, mag, cos_in, sin_in,
                       interpret: bool = False
                       ) -> Tuple[jax.Array, jax.Array]:
    """(..., F) x6 -> (real, imag) each (..., F). Fused on TPU; pass
    interpret=True off-TPU (tests/CPU)."""
    return _pallas_forward(l_mag, l_real, l_imag, mag, cos_in, sin_in,
                           interpret)


def _fwd(l_mag, l_real, l_imag, mag, cos_in, sin_in, interpret):
    out = _pallas_forward(l_mag, l_real, l_imag, mag, cos_in, sin_in,
                          interpret)
    return out, (l_mag, l_real, l_imag, mag, cos_in, sin_in)


def _bwd(interpret, residuals, cotangents):
    del interpret
    _, vjp_fn = jax.vjp(lambda *a: _mask_math(*a), *residuals)
    return vjp_fn(cotangents)


apply_complex_mask.defvjp(_fwd, _bwd)


def reference_mask_math(l_mag, l_real, l_imag, mag, cos_in, sin_in):
    """Plain-jnp oracle (same formula) for tests and CPU paths."""
    return _mask_math(l_mag, l_real, l_imag, mag, cos_in, sin_in)
