"""Block-sparse folded 3x3 convolution with fused pre-activation.

Why: the frequency-folded execution (ops/folded.py) turns the reference's
32-channel convs (resunet.py ConvBlockRes) into 128-lane convs — the right
bandwidth/layout trade on TPU — but the DENSE folded kernel is 75% zeros
(fold s=4), so XLA's convolution executes 4x the useful FLOPs, measured
~50% MXU on the profile. The folded kernel's sparsity is structured:

  freq-group tap dw=0 : fold-tridiagonal (use dense — 10/16 occupancy)
  freq-group tap dw=-1: ONE (cl, C') block — input fold s-1 only
  freq-group tap dw=+1: ONE (cl, C') block — input fold 0 only

(cl = logical channels; see _fold_embedding, ops/folded.py:61-74). This
kernel computes, per (batch, time-tile) grid step,

    y = conv3x3_folded(leaky(a * x + b), Kf)

as 3 full-K MXU matmuls (the dw=0 taps, K=C each) plus ONE packed matmul
for all corner taps (K = 6 * sum(cl_g)), on activations streamed from HBM
with a +-1-row halo via double-buffered manual DMA. The pre-activation
(BN affine + FiLM beta + leaky, folded_bn_film_act) rides along in VMEM —
XLA cannot fuse elementwise producers into conv inputs, so this also
removes one full HBM round-trip per conv.

Eval path only (training uses the XLA graph: autodiff + train-mode BN
statistics need x in HBM anyway).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_SLOPE = 0.01


def _leaky(x):
    return jnp.maximum(x, _NEG_SLOPE * x)


def _corner_meta(s: int, groups: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    """(lane_offset, cl) per (group, side) in packing order
    [g0_gm1, g0_gp1, g1_gm1, ...]. gm1 = input fold s-1 (last cl lanes of
    the group); gp1 = input fold 0 (first cl lanes)."""
    meta = []
    off = 0
    for cl in groups:
        cg = s * cl
        meta.append((off + cg - cl, cl))   # dw=-1 tap reads fold s-1
        meta.append((off, cl))             # dw=+1 tap reads fold 0
        off += cg
    return tuple(meta)


def pack_weights(kf: jax.Array, s: int, groups: Sequence[int]
                 ) -> Tuple[jax.Array, jax.Array]:
    """Folded kernel (3, 3, C, C') -> (w_center (3C, C'), w_corner
    (3 * 2 * sum(cl), C')). Row order: dt-major, matching the in-kernel
    piece order [dt x (g0_gm1, g0_gp1, g1_gm1, ...)]."""
    _, _, c, c2 = kf.shape
    meta = _corner_meta(s, groups)
    center = jnp.concatenate([kf[dt, 1] for dt in range(3)], axis=0)
    corner = jnp.concatenate(
        [kf[dt, dw][off:off + cl]
         for dt in range(3)
         for (off, cl), dw in zip(meta, [0, 2] * len(groups))],
        axis=0)
    return center, corner


def _kernel(x_hbm, a_ref, b_ref, wc_ref, wk_ref, out_ref, xs, corner_buf,
            sems, *, tt: int, t_total: int, groups: Tuple[int, ...],
            s: int, act_f32: bool = True, no_corner: bool = False,
            no_halo: bool = False):
    bi = pl.program_id(0)
    j = pl.program_id(1)
    n_t = pl.num_programs(1)
    n_b = pl.num_programs(0)
    g = out_ref.shape[2]
    c = x_hbm.shape[-1]
    c2 = out_ref.shape[-1]
    n = tt * g
    meta = _corner_meta(s, groups)

    # ---- double-buffered halo DMA ------------------------------------
    # scratch slot layout (tt + 4 rows): row 0 guard (masked), row 1 top
    # halo, rows [2, tt+2) main, row tt+2 bottom halo, row tt+3 guard.
    def issue(b_, j_, slot, start):
        def go(dma, pred=None):
            if pred is None:
                dma.start() if start else dma.wait()
            else:
                @pl.when(pred)
                def _():
                    dma.start() if start else dma.wait()

        go(pltpu.make_async_copy(
            x_hbm.at[b_, pl.ds(j_ * tt, tt)],
            xs.at[slot, pl.ds(2, tt)], sems.at[slot, 0]))
        if not no_halo:
            go(pltpu.make_async_copy(
                x_hbm.at[b_, pl.ds(jnp.maximum(j_ * tt - 1, 0), 1)],
                xs.at[slot, pl.ds(1, 1)], sems.at[slot, 1]), j_ > 0)
            go(pltpu.make_async_copy(
                x_hbm.at[b_,
                         pl.ds(jnp.minimum(j_ * tt + tt, t_total - 1), 1)],
                xs.at[slot, pl.ds(tt + 2, 1)], sems.at[slot, 2]),
               j_ < n_t - 1)

    step = bi * n_t + j
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        issue(bi, j, slot, start=True)

    # prefetch the next grid step's block into the other slot
    nxt = step + 1
    nb, nj = nxt // n_t, jax.lax.rem(nxt, n_t)

    @pl.when(nxt < n_b * n_t)
    def _():
        issue(nb, nj, 1 - slot, start=True)

    issue(bi, j, slot, start=False)  # wait for our block

    # ---- fused pre-activation ----------------------------------------
    a = a_ref[pl.ds(bi, 1), :][None]      # (1, 1, C) f32
    b = b_ref[pl.ds(bi, 1), :][None]
    x = xs[slot]                          # (tt + 4, G, C)
    if act_f32:
        h = _leaky(x.astype(jnp.float32) * a + b)
    else:
        h = _leaky(x * a.astype(x.dtype) + b.astype(x.dtype))
    r = jax.lax.broadcasted_iota(jnp.int32, (tt + 4, 1, 1), 0)
    t_glob = j * tt - 2 + r
    valid = (t_glob >= 0) & (t_glob < t_total) & (r >= 1) & (r <= tt + 2)
    h = jnp.where(valid, h, 0.0).astype(x.dtype)
    flat = h.reshape((tt + 4) * g, c)

    # ---- center taps: 3 full-K matmuls -------------------------------
    acc = jnp.zeros((n, c2), jnp.float32)
    for dt in range(3):
        acc = acc + jax.lax.dot(
            flat[(dt + 1) * g:(dt + 1) * g + n],
            wc_ref[pl.ds(dt * c, c)],
            preferred_element_type=jnp.float32)

    # ---- corner taps: one packed matmul ------------------------------
    gi = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    first_col = jax.lax.rem(gi, g) == 0        # g == 0 rows (gm1 invalid)
    last_col = jax.lax.rem(gi, g) == g - 1     # g == G-1 rows (gp1 invalid)
    # the +-1-sublane-shifted slices carry offset layouts Mosaic cannot
    # lane-concatenate directly; staging them through a VMEM scratch
    # normalizes the layout (the stores absorb the shift)
    if no_corner:
        out_ref[0] = acc.reshape(tt, g, c2).astype(out_ref.dtype)
        return
    col = 0
    for dt in range(3):
        base = (dt + 1) * g
        for pi, (off, cl) in enumerate(meta):
            shift = -1 if pi % 2 == 0 else 1   # gm1 reads g-1, gp1 g+1
            mask = first_col if shift == -1 else last_col
            p = flat[base + shift:base + shift + n, off:off + cl]
            corner_buf[:, col:col + cl] = jnp.where(mask, 0, p)
            col += cl
    acc = acc + jax.lax.dot(corner_buf[:], wk_ref[:],
                            preferred_element_type=jnp.float32)

    out_ref[0] = acc.reshape(tt, g, c2).astype(out_ref.dtype)


def fused_act_folded_conv(
    x: jax.Array,
    kf: jax.Array,
    a: jax.Array,
    b: jax.Array,
    s: int,
    groups: Sequence[int],
    t_tile: Optional[int] = None,
    interpret: bool = False,
    act_f32: bool = True,
    no_corner: bool = False,
    no_halo: bool = False,
) -> jax.Array:
    """y = folded_conv3x3(leaky(a * x + b), kf), block-sparse on MXU.

    x: (B, T, G, C) folded activations; kf: (3, 3, C, C') FOLDED kernel
    (fold_conv_kernel output, in_groups layout for concat inputs);
    a/b: (B, C) per-batch folded channel affine (BN scale / BN shift +
    FiLM beta, as in folded_bn_film_act); s: fold; groups: logical
    channels per concatenated input group (e.g. (32,) or (32, 32)).
    """
    bsz, t, g, c = x.shape
    c2 = kf.shape[-1]
    if t_tile is None:
        # 16 rows keeps the per-step VMEM footprint (2 DMA slots + f32
        # activation + corner stage + accumulator + out double-buffer)
        # ~10 MB — t_tile=32 measured 17.2M vs the 16M scoped limit
        t_tile = 16
    while t % t_tile:
        t_tile //= 2
    n_t = t // t_tile
    wc, wk = pack_weights(kf.astype(x.dtype), s, groups)

    kern = functools.partial(_kernel, tt=t_tile, t_total=t,
                             groups=tuple(groups), s=s, act_f32=act_f32,
                             no_corner=no_corner, no_halo=no_halo)
    return pl.pallas_call(
        kern,
        grid=(bsz, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bsz, c), lambda bi, ti: (0, 0)),
            pl.BlockSpec((bsz, c), lambda bi, ti: (0, 0)),
            pl.BlockSpec(wc.shape, lambda bi, ti: (0, 0)),
            pl.BlockSpec(wk.shape, lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_tile, g, c2),
                               lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, t, g, c2), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, t_tile + 4, g, c), x.dtype),
            pltpu.VMEM((t_tile * g, wk.shape[0]), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(x, a.astype(jnp.float32), b.astype(jnp.float32), wc, wk)


def reference_act_folded_conv(x, kf, a, b):
    """jnp oracle: leaky(a*x+b) -> dense folded conv (tests)."""
    h = _leaky(x.astype(jnp.float32) * a[:, None, None, :]
               + b[:, None, None, :]).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        h, kf.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
