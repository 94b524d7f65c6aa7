"""Fused BN-affine + FiLM-beta + leaky-relu + time-upsampling transposed
conv (the folded decoder convT) as ONE streaming Pallas TPU kernel.

Why: XLA does not fuse elementwise producers into an lhs-dilated
convolution's operand, so the bn1 + beta + leaky chain of
decoder_block5/6 runs as a standalone HBM-bound fusion (profiled 1.34 ms
at B=16) immediately before the convT (another 1.22 ms whose executed
FLOPs are 2x useful due to the dilation zeros). The fused kernel streams
the input once: per tile it applies the affine + act in VMEM (VPU) and
computes the two time-phase outputs with two K=C channel matmuls (MXU),
writing the time-interleaved result directly — HBM floor ~0.8 ms for the
dec6 shapes.

Math matched to the XLA path (ops/folded.py FoldedDecoderBlockRes1B):
  h = x * inv + shift          (BatchNorm eval affine, activation dtype)
  h = h + beta[b]              (FiLM)
  z = max(h, 0.01 * h)         (nn/layers.py leaky_relu)
  out[b, 2t + i] = z[b, t] @ W_i   (f32 accumulation, like XLA convs)
with W_i taken from the SAME dense folded convT kernel builder
(folded_convT_2x2's lhs-dilated kernel: W_0 = kern[1, 0], W_1 =
kern[0, 0]), so weights are bit-identical. Exactness pinned in
tests/test_pallas_convt.py. Reference op: resunet.py:216-224 upsampling.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, inv_ref, shift_ref, beta_ref, w_ref, o_ref):
    x = x_ref[0]                      # (Tt, G, C)
    inv = inv_ref[...]                # (C,)
    shift = shift_ref[...]
    beta = beta_ref[0, 0]             # (C,)
    h = x * inv + shift
    h = h + beta
    z = jnp.maximum(h, 0.01 * h)
    tt, g, c = z.shape
    z2 = z.reshape(tt * g, c)
    y0 = jnp.dot(z2, w_ref[0], preferred_element_type=jnp.float32)
    y1 = jnp.dot(z2, w_ref[1], preferred_element_type=jnp.float32)
    co = w_ref.shape[-1]
    y = jnp.stack([y0.reshape(tt, g, co), y1.reshape(tt, g, co)],
                  axis=1)             # (Tt, 2, G, Co)
    o_ref[0] = y.reshape(2 * tt, g, co).astype(o_ref.dtype)


def fused_act_convT(x: jax.Array, inv: jax.Array, shift: jax.Array,
                    beta: jax.Array, w_pair: jax.Array,
                    t_tile: int = 16, interpret: bool = False) -> jax.Array:
    """x (B, T, G, C); inv/shift (C,); beta (B, C); w_pair (2, C, Co)
    with out[:, 2t+i] = act(affine(x[:, t])) @ w_pair[i].
    Returns (B, 2T, G, Co)."""
    b, t, g, c = x.shape
    co = w_pair.shape[-1]
    while t % t_tile:
        t_tile //= 2
    grid = (b, t // t_tile)
    inv = inv.astype(x.dtype)
    shift = shift.astype(x.dtype)
    # (B, 1, C): Mosaic requires the last two block dims divisible by
    # (8, 128) or equal to the full array dims
    beta = beta.astype(x.dtype).reshape(b, 1, c)
    w_pair = w_pair.astype(x.dtype)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t_tile, g, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((2, c, co), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * t_tile, g, co),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2 * t, g, co), x.dtype),
        interpret=interpret,
    )(x, inv, shift, beta, w_pair)
