"""Fused Pallas kernel: one whole folded ConvBlockRes in VMEM.

Motivation (profiler, 16-clip forward): XLA TPU cannot fuse elementwise
producers into convolution INPUTS, so each ConvBlockRes costs separate
HBM round-trips for [BN+FiLM+leaky] x2 plus two convs plus the residual
add (~11.5 ms of standalone multiply_maximum fusions + copy traffic).
This kernel computes

    out = x + conv3x3(leaky(a2 * conv3x3(leaky(a1*x + b1), W1) + b2), W2)

for a (B, T, G, U) frequency-folded tile entirely in VMEM: x streams from
HBM once per tile (with a +-2-row halo), both convs run as 9 shifted
(rows, U) @ (U, U) MXU matmuls with f32 accumulation, and the result
streams out once. BN scale/shift and the per-batch FiLM betas are folded
into the per-channel affine vectors a/b outside the kernel.

Eval/serving path only (training uses the XLA graph — gradients need the
full autodiff graph anyway and the train-mode BN statistics pass reads x
regardless).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_SLOPE = 0.01


def _leaky(x):
    return jnp.maximum(x, _NEG_SLOPE * x)


def _conv3x3_tile(h, w, rows_out):
    """h: (rows_out + 2, G + 2, U) pre-padded; w: (3, 3, U, U') ->
    (rows_out, G, U') with f32 accumulation."""
    _, gp, u = h.shape
    g = gp - 2
    uo = w.shape[-1]
    acc = jnp.zeros((rows_out * g, uo), jnp.float32)
    for dt in range(3):
        for dg in range(3):
            patch = h[dt:dt + rows_out, dg:dg + g, :].reshape(rows_out * g, u)
            acc = acc + jnp.dot(patch, w[dt, dg],
                                preferred_element_type=jnp.float32)
    return acc.reshape(rows_out, g, uo)


def _block_kernel(x_ref, w1_ref, w2_ref, a1_ref, b1_ref, a2_ref, b2_ref,
                  out_ref):
    t_tile = out_ref.shape[1]
    x = x_ref[0, 0]  # (t_tile + 4, G, U)
    bi = pl.program_id(0)
    a1 = a1_ref[pl.ds(bi, 1), :][None]  # (1, 1, U)
    b1 = b1_ref[pl.ds(bi, 1), :][None]
    a2 = a2_ref[pl.ds(bi, 1), :][None]
    b2 = b2_ref[pl.ds(bi, 1), :][None]

    # SAME-conv zero padding applies to the ACTIVATED tensors, and
    # affine(0) != 0 — rows outside the global [0, T) range must be zeroed
    ti = pl.program_id(1)
    total = pl.num_programs(1) * t_tile

    def row_mask(offset, rows):
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
        g = ti * t_tile + offset + r
        return ((g >= 0) & (g < total))

    h1 = _leaky(x.astype(jnp.float32) * a1 + b1)
    h1 = jnp.where(row_mask(-2, t_tile + 4), h1, 0.0)
    h1 = jnp.pad(h1.astype(x.dtype), ((0, 0), (1, 1), (0, 0)))
    y1 = _conv3x3_tile(h1, w1_ref[:], t_tile + 2)
    h2 = _leaky(y1 * a2 + b2)
    h2 = jnp.where(row_mask(-1, t_tile + 2), h2, 0.0)
    h2 = jnp.pad(h2.astype(x.dtype), ((0, 0), (1, 1), (0, 0)))
    y2 = _conv3x3_tile(h2, w2_ref[:], t_tile)
    out_ref[0] = x[2:2 + t_tile] + y2.astype(x.dtype)


def fused_residual_conv_block(
    x: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    a1: jax.Array, b1: jax.Array,
    a2: jax.Array, b2: jax.Array,
    t_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """x: (B, T, G, U); w1/w2: (3, 3, U, U) folded kernels; a*/b*: (B, U)
    per-batch channel affines (BN folded with FiLM betas). T must divide by
    t_tile; in == out channels (identity residual), i.e. encoder_block1's
    conv_block1 in folded form."""
    b, t, g, u = x.shape
    assert t % t_tile == 0, (t, t_tile)
    n_t = t // t_tile

    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    windows = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xp, i * t_tile, t_tile + 4, axis=1)
         for i in range(n_t)], axis=1)  # (B, n_t, t_tile+4, G, U)

    vec = pl.BlockSpec((b, u), lambda bi, ti: (0, 0))  # whole table
    full_w = pl.BlockSpec((3, 3, u, u), lambda bi, ti: (0, 0, 0, 0))
    return pl.pallas_call(
        _block_kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, t_tile + 4, g, u),
                         lambda bi, ti: (bi, ti, 0, 0, 0)),
            full_w, full_w, vec, vec, vec, vec,
        ],
        out_specs=pl.BlockSpec((1, t_tile, g, u),
                               lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, g, u), x.dtype),
        interpret=interpret,
    )(windows, w1.astype(x.dtype), w2.astype(x.dtype),
      a1.astype(jnp.float32), b1.astype(jnp.float32),
      a2.astype(jnp.float32), b2.astype(jnp.float32))
