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


# ---------------------------------------------------------------------------
# Fused head: after_conv (1x1, folded) + complex-mask apply in ONE kernel.
#
# The folded after_conv writes a (B, T, G, s*out*K) tensor whose 12 logical
# channels are lane-padded to 128 on TPU — a 537 MB HBM write for 50 MB of
# masks per 16-clip forward (profiled 3.6 ms), plus pad/crop copies around
# the mask kernel. Fusing the 1x1 conv into the mask kernel reads the
# decoder output ONCE and writes only the (B, T, G, s) complex spectrum.
# ---------------------------------------------------------------------------


def head_mask_reference(h, w_mag, w_r, w_i, b_mag, b_r, b_i,
                        real_f, imag_f, eps: float = 1e-10):
    """jnp oracle/backward for the fused head. h (B,T,G,C); the three
    (C, M) weight column-groups + (M,) biases of the folded after_conv
    (M = S*out_ch lanes, mask-k major-split beforehand); real_f/imag_f the
    folded raw spectrum expanded to the same M lanes. Returns
    (out_real, out_imag) each (B,T,G,M)."""
    hf = h.astype(jnp.float32)

    def head(w, b):
        return jnp.einsum("btgc,cm->btgm", hf, w.astype(jnp.float32)) \
            + b.astype(jnp.float32)

    return _mask_math_from_ri(
        head(w_mag, b_mag), head(w_r, b_r), head(w_i, b_i),
        real_f.astype(jnp.float32), imag_f.astype(jnp.float32), eps)


def _head_kernel(h_ref, wm_ref, wr_ref, wi_ref, bm_ref, br_ref, bi_ref,
                 re_ref, im_ref, real_ref, imag_ref):
    t_t, g, c = h_ref.shape[1:]
    m = wm_ref.shape[-1]
    x = h_ref[0].reshape(t_t * g, c)

    def head(w_ref2, b_ref2):
        l = jax.lax.dot(x, w_ref2[:], preferred_element_type=jnp.float32)
        return (l + b_ref2[0][None, :]).reshape(t_t, g, m)

    out_real, out_imag = _mask_math_from_ri(
        head(wm_ref, bm_ref), head(wr_ref, br_ref), head(wi_ref, bi_ref),
        re_ref[0], im_ref[0])
    real_ref[0] = out_real
    imag_ref[0] = out_imag


def _head_forward(h, w_mag, w_r, w_i, b_mag, b_r, b_i, real_f, imag_f,
                  interpret):
    b, t, g, c = h.shape
    m = w_mag.shape[-1]
    # Small tiles: the m-lane intermediates pad to 128 lanes in VMEM, so a
    # 128-row tile overflows the 16 MB scoped-vmem limit (measured 72 MB).
    t_tile = next(tt for tt in (16, 8, 4, 2, 1) if t % tt == 0)
    grid = (b, t // t_tile)
    act_spec = pl.BlockSpec((1, t_tile, g, c), lambda i, j: (i, j, 0, 0))
    spec_spec = pl.BlockSpec((1, t_tile, g, m), lambda i, j: (i, j, 0, 0))
    w_spec = pl.BlockSpec((c, m), lambda i, j: (0, 0))
    b_spec = pl.BlockSpec((1, m), lambda i, j: (0, 0))
    as_b = lambda v: v.reshape(1, m).astype(jnp.float32)
    real, imag = pl.pallas_call(
        _head_kernel,
        grid=grid,
        in_specs=[act_spec, w_spec, w_spec, w_spec, b_spec, b_spec, b_spec,
                  spec_spec, spec_spec],
        out_specs=(spec_spec, spec_spec),
        out_shape=(jax.ShapeDtypeStruct((b, t, g, m), jnp.float32),
                   jax.ShapeDtypeStruct((b, t, g, m), jnp.float32)),
        interpret=interpret,
    )(h, w_mag.astype(h.dtype), w_r.astype(h.dtype), w_i.astype(h.dtype),
      as_b(b_mag), as_b(b_r), as_b(b_i),
      real_f.astype(jnp.float32), imag_f.astype(jnp.float32))
    return real, imag


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def apply_head_mask_folded(h, w_mag, w_r, w_i, b_mag, b_r, b_i,
                           real_f, imag_f, interpret: bool = False):
    """Fused folded after_conv (1x1) + K=3 complex-mask apply.

    h: decoder output, folded (B, T, G, C); w_mag/w_r/w_i: (C, M) column
    groups of the folded after_conv kernel for the magnitude/real/imag
    mask logits (M = S*out_ch); b_*: their (M,) biases; real_f/imag_f:
    folded raw mixture spectrum (B, T, G, M). Returns (out_real, out_imag)
    (B, T, G, M) f32 — a free reshape away from (B, T, S*G) since
    f = S*g + r. Differentiable (jnp recompute backward).
    """
    return _head_forward(h, w_mag, w_r, w_i, b_mag, b_r, b_i,
                         real_f, imag_f, interpret)


def _head_fwd(h, w_mag, w_r, w_i, b_mag, b_r, b_i, real_f, imag_f,
              interpret):
    out = _head_forward(h, w_mag, w_r, w_i, b_mag, b_r, b_i,
                        real_f, imag_f, interpret)
    return out, (h, w_mag, w_r, w_i, b_mag, b_r, b_i, real_f, imag_f)


def _head_bwd(interpret, residuals, cotangents):
    del interpret
    _, vjp_fn = jax.vjp(lambda *a: head_mask_reference(*a), *residuals)
    return vjp_fn(cotangents)


apply_head_mask_folded.defvjp(_head_fwd, _head_bwd)
