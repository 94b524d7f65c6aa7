"""Frequency-folding (space-to-depth) execution of low-channel conv levels.

Why: on TPU, NHWC activations are tiled (8|16, 128) over the last two dims,
so levels with 32-64 channels at the largest spectrogram resolutions pad the
lane dimension 4x/2x — XLA's cost model showed 83 GB of HBM traffic per
16-clip ResUNet30 forward (vs ~20 GB unpadded), making the model
memory-bound. Folding s frequency bins into channels makes the channel dim
128 and removes ALL padding, with mathematically identical results:

    x'(b, t, g, r*C + c) = x(b, t, s*g + r, c)     (a free reshape)

- 3x3/1x1 convs become folded convs whose (kh, kw', s*Cin, s*Cout) kernels
  are built from the logical (kh, kw, Cin, Cout) parameters by a fixed
  sparse embedding (derived below); FLOPs grow s-fold but run at full MXU
  lane utilization, while HBM bytes drop s-fold — the right trade on TPU.
- BatchNorm/FiLM/leaky-relu run on a (B, T, G, s, C) view, so parameters,
  statistics, and results are bit-identical to the unfolded form.
- 2x2 avg-pool halves T normally and averages fold-neighbor pairs, leaving
  a fold-s/2 layout.
- the kernel==stride transposed conv becomes one matmul + depth-to-space.

Derivation for the folded conv: with f = s*g + r and SAME padding,
y(t, s*g + r_o) = sum_df W[df] x(t, s*g + r_o + df); writing
s*g + r_o + df = s*(g + D) + r_i gives df = s*D + r_i - r_o, so the folded
kernel entry (D, r_i -> r_o) is W[s*D + r_i - r_o] when that offset lies
within the logical kernel width, else zero. Parameter trees are UNCHANGED —
folding happens at apply time — so checkpoints/converters are oblivious.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lass_tpu.nn.layers import BatchNorm, leaky_relu, xavier_uniform

# Opt-in fused Pallas conv-block (read ONCE at import; trace-time env reads
# are a footgun if the flag flips between traces of the same program)
_FUSED_CONV_BLOCK = os.environ.get("LASS_TPU_FUSED_CONV_BLOCK") == "1"
# Folded 3x3 conv implementation (latched at import):
#   'dense'      — one conv with the (3, 3, s*Cin, s*Cout) dense folded
#                  kernel (4x useful FLOPs at s=4, runs ~peak MXU).
#   'halo'       — im2col-halo: gather each group's s+2 relevant freq
#                  positions into (s+2)*Cin lanes, one (3, 1) conv with
#                  K = 3*(s+2)*Cin — (s+2)/3x useful FLOPs (2x at s=4,
#                  1.33x at s=2) at full lane utilization.
#   'phase'      — phase-shifted conv pair (DEFAULT, eval and train):
#                  conv1 writes a half-group-shifted fold layout via a
#                  (kh, 2) kernel, conv2 shifts back — plain dense convs
#                  at 2/3 the folded FLOPs each, no lane ops. Exactness
#                  (fwd, BN stats, grads) pinned in tests/test_folded.py;
#                  measured 327 vs 296 clips/s on v5e.
#   'decomposed' — center + corner taps: MEASURED SLOWER on v5e (131 vs
#                  296 clips/s — the corner conv's lane-sliced shifted
#                  input defeats XLA's conv input fusion).
_CONV_IMPL = os.environ.get(
    "LASS_TPU_CONV_IMPL",
    "decomposed" if os.environ.get("LASS_TPU_DECOMPOSED_CONV") == "1"
    else "phase")
_DECOMPOSED_CONV = _CONV_IMPL == "decomposed"
# Folded 1x1 convs: 'dense' (block-diagonal folded kernel, s x useful
# FLOPs) or 'grouped' (feature_group_count=s, no blow-up).
_CONV_1X1 = os.environ.get("LASS_TPU_CONV_1X1", "dense")
# Folded kernel==stride transposed conv: 'dense' (s_in x useful FLOPs)
# or 'grouped' (feature_group_count=s_in, no blow-up — each input fold
# slot's two output slots are lane-adjacent, so groups stay contiguous).
_CONVT_IMPL = os.environ.get("LASS_TPU_CONVT_IMPL", "dense")
# conv1/conv2 fusion barrier placement: 'pre_act' (between conv1 and
# bn2/act — round-2 default), 'post_act' (after the act, letting the act
# fuse upward into conv1's output fusion), 'off'.
_CONV_BARRIER = os.environ.get("LASS_TPU_CONV_BARRIER", "pre_act")
# fold-pair pool averaging: 'conv' (DEFAULT — 1x1 conv against the
# constant refold matrix; the conv emitter writes the canonical
# activation layout, where the dot's transposed output escaped as a
# {2,3,1,0}-layout tuple + two full-tensor retiling copies at the
# encoder_block2 input, ~1 ms/fwd) or 'dot' (the round-2 matmul form —
# measured 353.1 vs 360.3 clips/s at B=16 under phase).
_POOL_IMPL = os.environ.get("LASS_TPU_POOL_IMPL", "conv")
# L1 (widest level) layout: 'freq' (fold-4 frequency, the round-2/3
# default) or 'mixed' (2x2 time-x-frequency fold with the phase trick in
# BOTH axes: the conv pair runs (2, 2) kernels at 16/9 of the logical
# FLOPs vs 8/3 for freq-fold phase — see the mixed-fold section below).
_L1_LAYOUT = os.environ.get("LASS_TPU_L1_LAYOUT", "freq")
# fused bn+beta+leaky+convT Pallas kernel for the folded decoder blocks
# (opt-in: measured 279.0 vs 360.2 clips/s full-forward on v5e — Mosaic's
# pipeline loses to XLA's lhs-dilated conv engine at these shapes, same
# story as the sparse_conv attempt; kept exactness-pinned behind the flag)
_FUSED_CONVT = os.environ.get("LASS_TPU_FUSED_CONVT", "0") == "1"
# int8 MXU execution of the folded conv blocks (eval-only; needs a
# calibration pass — see ops/quant.py). Latched at import.
_QUANT = os.environ.get("LASS_TPU_QUANT", "0") == "1"



def fold_freq(x: jax.Array, s: int) -> jax.Array:
    """(B, T, F, C) -> (B, T, F//s, s*C); pure reshape (free)."""
    b, t, f, c = x.shape
    return x.reshape(b, t, f // s, s * c)


def unfold_freq(x: jax.Array, s: int) -> jax.Array:
    """(B, T, G, s*C) -> (B, T, s*G, C); pure reshape (free)."""
    b, t, g, sc = x.shape
    return x.reshape(b, t, g * s, sc // s)


import functools


@functools.lru_cache(maxsize=None)
def _fold_embedding(s: int, kw: int) -> np.ndarray:
    """Constant 0/1 tensor E[D, r_i, r_o, df] selecting which logical
    kernel tap feeds each folded (D, r_i -> r_o) entry."""
    half = kw // 2
    e = np.zeros((kw, s, s, kw), np.float32)
    for d in range(-half, half + 1):
        for r_i in range(s):
            for r_o in range(s):
                df = s * d + r_i - r_o
                if -half <= df <= half:
                    e[d + half, r_i, r_o, df + half] = 1.0
    return e


def fold_conv_kernel(w: jax.Array, s: int,
                     in_groups: Optional[Sequence[int]] = None) -> jax.Array:
    """(kh, kw, Cin, Cout) logical -> (kh, kw, s*Cin, s*Cout) folded, via
    ONE einsum against a trace-time constant embedding.

    in_groups: when the folded input is a CONCAT of separately-folded
    tensors (decoder skip concat), the channel splits of Cin.
    """
    kh, kw, cin, cout = w.shape
    e = jnp.asarray(_fold_embedding(s, kw))
    if not in_groups or len(in_groups) == 1:
        # out[k, d, r_i, c_i, r_o, c_o] = sum_f E[d,r_i,r_o,f] W[k,f,c_i,c_o]
        folded = jnp.einsum("drof,kfij->kdrioj", e, w)
        return folded.reshape(kh, kw, s * cin, s * cout)
    offsets = np.cumsum([0] + list(in_groups))
    parts = []
    for gi, cg in enumerate(in_groups):
        i0 = int(offsets[gi])
        wg = w[:, :, i0:i0 + cg]
        folded = jnp.einsum("drof,kfij->kdrioj", e, wg)
        parts.append(folded.reshape(kh, kw, s * cg, s * cout))
    return jnp.concatenate(parts, axis=2)


def folded_conv(x: jax.Array, w: jax.Array, s: int,
                bias: Optional[jax.Array] = None,
                in_groups: Optional[Sequence[int]] = None) -> jax.Array:
    """Apply a logical conv on a folded tensor. x: (B, T, G, s*Cin)."""
    if w.shape[0] == w.shape[1] == 1 and _CONV_1X1 == "grouped":
        return folded_conv_grouped_1x1(x, w, s, bias=bias,
                                       in_groups=in_groups)
    kernel = fold_conv_kernel(w, s, in_groups).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        cout = w.shape[-1]
        y = y + jnp.tile(bias, s).astype(y.dtype)
    return y


def folded_conv_grouped_1x1(x: jax.Array, w: jax.Array, s: int,
                            bias: Optional[jax.Array] = None,
                            in_groups: Optional[Sequence[int]] = None
                            ) -> jax.Array:
    """Folded 1x1 conv with NO structural FLOPs blow-up: every fold slot
    applies the same logical (Cin, Cout) weights, which is exactly a
    feature_group_count=s convolution with the kernel tiled s times along
    the output axis. A concat input (in_groups) is handled as one grouped
    conv per group, summed (fold slot r of group g is not lane-contiguous
    with slot r of the other groups, so a single grouped conv can't span
    them)."""
    cout = w.shape[-1]
    groups = list(in_groups) if in_groups else [x.shape[-1] // s]
    offsets = np.cumsum([0] + [s * cg for cg in groups])
    ci0 = 0
    y = None
    for gi, cg in enumerate(groups):
        wg = w[:, :, ci0:ci0 + cg]
        ci0 += cg
        kern = jnp.tile(wg, (1, 1, 1, s)).astype(x.dtype)
        part = jax.lax.conv_general_dilated(
            x[..., int(offsets[gi]):int(offsets[gi + 1])], kern,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=s)
        y = part if y is None else y + part
    if bias is not None:
        y = y + jnp.tile(bias, s).astype(y.dtype)
    return y


@functools.lru_cache(maxsize=None)
def _phase_embedding(s: int, kw: int, up: bool) -> np.ndarray:
    """Constant 0/1 tensor E[t, r_i, r_o, f] for the phase-shifted conv
    pair (phase = -s//2). down (up=False): output group o reads input
    groups o-1+t, and output slot (o, r_o) holds logical frequency
    s*o + r_o + phase. up: input is phase-shifted, output is phase-0,
    output group o reads input groups o+t."""
    half = kw // 2
    phase = -(s // 2)
    e = np.zeros((2, s, s, kw), np.float32)
    for t in range(2):
        for r_i in range(s):
            for r_o in range(s):
                if up:
                    df = s * t + r_i + phase - r_o
                else:
                    df = s * (t - 1) + r_i - r_o - phase
                if -half <= df <= half:
                    e[t, r_i, r_o, df + half] = 1.0
    return e


def _phase_kernel(w: jax.Array, s: int, up: bool,
                  in_groups: Optional[Sequence[int]]) -> jax.Array:
    kh, kw, cin_total, cout = w.shape
    e = jnp.asarray(_phase_embedding(s, kw, up))
    groups = list(in_groups) if in_groups else [cin_total]
    parts = []
    ci0 = 0
    for cg in groups:
        wg = w[:, :, ci0:ci0 + cg]
        ci0 += cg
        kg = jnp.einsum("trof,kfij->ktrioj", e, wg)
        parts.append(kg.reshape(kh, 2, s * cg, s * cout))
    return jnp.concatenate(parts, axis=2)


def phase_garbage_mask(s: int, g_out: int, lanes: int) -> np.ndarray:
    """(1, 1, g_out, lanes) 0/1 mask zeroing the fold slots of a
    phase-shifted tensor whose logical frequency falls outside
    [0, s*(g_out-1)): slots r < s//2 of group 0 and r >= s//2 of the last
    group. Zeroing them restores the logical conv's zero-padding
    semantics for the phase-up conv EXACTLY."""
    c = lanes // s
    m = np.ones((1, 1, g_out, lanes), np.float32)
    m[:, :, 0, :(s // 2) * c] = 0.0
    m[:, :, g_out - 1, (s // 2) * c:] = 0.0
    return m


def folded_conv_phase(x: jax.Array, w: jax.Array, s: int, up: bool,
                      in_groups: Optional[Sequence[int]] = None
                      ) -> jax.Array:
    """One half of the phase-shifted folded conv pair: a plain dense conv
    with kernel (kh, 2, s*Cin, s*Cout) — executed K is 2/3 of the dense
    folded kernel's (32 fold-blocks vs 48 at any s) with zero extra ops.

    down: (B, T, G, s*Cin) -> (B, T, G+1, s*Cout) where output slot
    (o, r) holds logical frequency s*o + r - s//2 (G-padding (1, 1)).
    up: (B, T, G+1, s*Cin) phase-shifted -> (B, T, G, s*Cout) phase-0
    (no G-padding). The caller MUST zero the out-of-range slots
    (phase_garbage_mask) between down and up — they hold boundary values
    the logical conv's zero padding requires to be 0.
    """
    kh, kw, _, _ = w.shape
    kern = _phase_kernel(w, s, up, in_groups).astype(x.dtype)
    pad_t = kh // 2
    pad_g = (0, 0) if up else (1, 1)
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1),
        padding=((pad_t, pad_t), pad_g),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.lru_cache(maxsize=None)
def _halo_embedding(s: int, kw: int) -> np.ndarray:
    """Constant 0/1 tensor E[p, r_o, f]: window freq position p (0..s+1,
    logical offset p-1 from the group base) feeds output fold slot r_o via
    logical kernel tap f = p - r_o (when in range)."""
    half = kw // 2
    e = np.zeros((s + 2 * half, s, kw), np.float32)
    for p in range(s + 2 * half):
        for r_o in range(s):
            f = p - r_o
            if 0 <= f < kw:
                e[p, r_o, f] = 1.0
    return e


def folded_conv_halo(x: jax.Array, w: jax.Array, s: int,
                     in_groups: Optional[Sequence[int]] = None) -> jax.Array:
    """`folded_conv` via im2col-halo: executed K drops from kh*kw*s*Cin
    (dense folded) to kh*(s+2)*Cin — (s+2)/(kw*s) of the dense FLOPs
    (50% at s=4, 67% at s=2 for kw=3) at full MXU lane utilization.

    Each fold group's window needs freq positions s*g-1 .. s*g+s (the s
    in-group bins plus one halo bin each side), gathered into
    (s+2)*Cin lanes by two G-shifted lane slices + concat; the conv then
    has NO freq-G taps, only the kh time taps. Numerics are EXACT (same
    taps, f32 accumulation) — pinned vs folded_conv in tests/test_folded.py.
    """
    kh, kw, cin_total, cout = w.shape
    if kw != 3 or s == 1:
        return folded_conv(x, w, s, in_groups=in_groups)
    groups = list(in_groups) if in_groups else [cin_total]
    e = jnp.asarray(_halo_embedding(s, kw))

    parts = []
    kparts = []
    off = 0
    ci0 = 0
    for cg in groups:
        xg = x[..., off:off + s * cg]
        off += s * cg
        wg = w[:, :, ci0:ci0 + cg]
        ci0 += cg
        parts.append(_shift_g(xg[..., (s - 1) * cg:], +1))  # freq s*g - 1
        parts.append(xg)
        parts.append(_shift_g(xg[..., :cg], -1))            # freq s*g + s
        # kern[k, p, i, r, j] = W[k, p - r, i, j] (zero out of range)
        kg = jnp.einsum("prf,kfij->kpirj", e, wg)
        kparts.append(kg.reshape(kh, (s + 2) * cg, s * cout))
    xh = jnp.concatenate(parts, axis=-1)
    kern = jnp.concatenate(kparts, axis=1)[:, None]  # (kh, 1, K, s*Cout)
    pad_t = kh // 2
    return jax.lax.conv_general_dilated(
        xh, kern.astype(x.dtype), window_strides=(1, 1),
        padding=((pad_t, pad_t), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _shift_g(x: jax.Array, direction: int) -> jax.Array:
    """Zero-fill shift along the folded-frequency (G) axis:
    direction=+1 -> out[g] = x[g-1] (zero at g=0), matching the SAME-pad
    semantics of the dense folded conv's D=-1 tap."""
    g = x.shape[2]
    if direction == +1:
        return jnp.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :g]
    return jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]


def folded_conv_decomposed(x: jax.Array, w: jax.Array, s: int,
                           in_groups: Optional[Sequence[int]] = None
                           ) -> jax.Array:
    """`folded_conv` with the 4x structural-FLOPs blow-up cut to ~2x.

    The dense folded kernel (3, 3, s*Cin, s*Cout) is 75% zeros at s=4:
    the D=0 freq-group tap is fold-tridiagonal (10/16 blocks) while the
    D=+-1 taps each hold ONE (Cin, Cout) block (see the derivation in the
    module docstring). Profiled on v5e, XLA runs the dense kernel at peak
    MXU (~194 TFLOP/s), so the only lever is executing fewer FLOPs:

      y = conv3x1(x, K_D0)            # 3/9 of the dense taps, fully used
        + conv3x1(x_side, K_corner)   # the 2 cross-group blocks per group

    where x_side stacks the G-shifted boundary fold-slot lanes (last
    logical-channel slice of each group shifted g-1 -> g, first slice
    shifted g+1 -> g — pure slice/pad ops that fuse into the corner
    conv's input) and K_corner holds the matching W[-1]/W[+1] rows. Both
    convs keep K >= 64 and N = s*Cout on the MXU, numerics are EXACT
    (same taps, same summation structure, verified vs folded_conv in
    tests/test_folded.py), and total matmul FLOPs drop to
    (3*s*Cin + 3*2*Cin) / (9*s*Cin) = 50% at s=4."""
    kh, kw, cin_total, cout = w.shape
    if kw != 3 or kh != 3 or s == 1:
        return folded_conv(x, w, s, in_groups=in_groups)
    groups = list(in_groups) if in_groups else [cin_total]
    kf = fold_conv_kernel(w, s, in_groups)  # (3, 3, s*Cin, s*Cout)

    y = jax.lax.conv_general_dilated(
        x, kf[:, 1:2].astype(x.dtype), window_strides=(1, 1),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    sides = []
    k_rows = []
    off = 0
    for cl in groups:
        cg = s * cl
        # D=-1 tap: y(g) += x(g-1, fold s-1) @ W[df=-1]
        sides.append(_shift_g(x[..., off + cg - cl:off + cg], +1))
        k_rows.append(kf[:, 0, off + cg - cl:off + cg])
        # D=+1 tap: y(g) += x(g+1, fold 0) @ W[df=+1]
        sides.append(_shift_g(x[..., off:off + cl], -1))
        k_rows.append(kf[:, 2, off:off + cl])
        off += cg
    x_side = jnp.concatenate(sides, axis=-1)
    k_side = jnp.concatenate(k_rows, axis=1)[:, None]  # (3, 1, K_side, sC')
    return y + jax.lax.conv_general_dilated(
        x_side, k_side.astype(x.dtype), window_strides=(1, 1),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def folded_after_conv_transposed(x: jax.Array, w: jax.Array,
                                 bias: jax.Array, s: int) -> jax.Array:
    """The mask-head 1x1 conv (reference resunet.py after_conv) as a
    TRANSPOSED-OUTPUT dot: (B, T, G, s*Cin) x (1, 1, Cin, J) -> unfolded
    logits (B, T, s*G, J).

    A folded 1x1 conv writes (B, T, G, s*J) with s*J = 12 lanes padded to
    128 on TPU — a 32x physical HBM blow-up (537 MB for 50 MB of masks,
    profiled 3.6 ms at B=16). Emitting the dot as (s*J, B, T, G) keeps the
    minor dim at G = 128 (zero pad); the final rearrange to true frequency
    order moves only the logical 50 MB.
    """
    b, t, g, _ = x.shape
    j = w.shape[-1]
    w2d = fold_conv_kernel(w, s)[0, 0]              # (s*Cin, M), m = r*J+j
    m = w2d.shape[1]
    # k-major column order m' = j*s + r so the per-head slices downstream
    # are contiguous
    perm = np.arange(m).reshape(s, j).T.reshape(-1)
    w2d = w2d[:, perm].astype(x.dtype)
    bias_f = jnp.tile(bias, s)[perm].astype(jnp.float32)
    l = jax.lax.dot_general(
        w2d.T, x, dimension_numbers=(((1,), (3,)), ((), ())),
        preferred_element_type=jnp.float32)          # (M, B, T, G)
    l = (l + bias_f[:, None, None, None]).astype(x.dtype)
    # (m'=(j,r), B, T, G) -> (B, T, G, r, j) -> (B, T, F=g*s+r, J)
    l = l.reshape(j, s, b, t, g)
    l = jnp.transpose(l, (2, 3, 4, 1, 0))
    return l.reshape(b, t, g * s, j)


@functools.lru_cache(maxsize=None)
def _refold_matrix(s: int, c: int) -> np.ndarray:
    """(s*c, (s//2)*c) constant averaging fold-neighbor channel pairs."""
    p = np.zeros((s * c, (s // 2) * c), np.float32)
    for r2 in range(s // 2):
        for ch in range(c):
            p[(2 * r2) * c + ch, r2 * c + ch] = 0.5
            p[(2 * r2 + 1) * c + ch, r2 * c + ch] = 0.5
    return p


def folded_avg_pool_2x2(x: jax.Array, s: int) -> jax.Array:
    """2x2 avg pool on a (plain) fold-s tensor -> fold-s//2 tensor at
    (T/2, G): time via nn.avg_pool (stays fused in XLA), fold-pair
    averaging via ONE matmul against a constant 0/0.5 matrix when s > 2 —
    the slice-add-concat form wrote (s//2) 32-lane intermediates that
    lane-pad 4x on TPU. (A fully-conv strided formulation was tried and
    REGRESSED B=16 76.6 ms vs 55.2: strided convs schedule poorly and
    break the surrounding fusion chains.)"""
    b, t, g, sc = x.shape
    c = sc // s
    xt = nn.avg_pool(x, (2, 1), (2, 1))
    if s == 2:
        return 0.5 * (xt[..., :c] + xt[..., c:])
    m = jnp.asarray(_refold_matrix(s, c)).astype(x.dtype)
    if _POOL_IMPL == "conv":
        # same contraction expressed as a 1x1 conv: the conv emitter
        # writes the canonical {C,B,G,T} activation layout directly,
        # where the dot's transposed output needed two full-tensor
        # copies (profiled 1.3 ms at B=16)
        return jax.lax.conv_general_dilated(
            xt, m[None, None], window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.lax.dot_general(
        xt, m, dimension_numbers=(((3,), (0,)), ((), ())))


@functools.lru_cache(maxsize=None)
def _convT_fold_embedding(s_in: int) -> np.ndarray:
    """Constant one-hot E[r_i, j, r_o] with r_o = 2*r_i + j: which output
    fold slot each (input fold, freq tap) pair feeds."""
    e = np.zeros((s_in, 2, 2 * s_in), np.float32)
    for r_i in range(s_in):
        for j in range(2):
            e[r_i, j, 2 * r_i + j] = 1.0
    return e


def folded_convT_2x2(x: jax.Array, w: jax.Array, s_in: int,
                     impl: Optional[str] = None) -> jax.Array:
    """kernel==stride (2,2) transposed conv on a fold-s_in tensor ->
    fold-2*s_in tensor at (2T, G). w: (2, 2, Cout, Cin) (the
    conv_transpose2d param layout).

    Implemented as ONE lhs-dilated convolution writing the time-interleaved
    output directly: the einsum+reshape formulation produced a
    (b, t, 2, g, c) intermediate whose merge into (b, 2t, g, c) cost a
    full-tensor layout copy (profiled ~5 ms per 16-clip forward). The freq
    tap lands in the output FOLD slot (r_o = 2*r_i + j), so frequency
    upsampling is purely a channel mapping and only time needs dilation:
    y[2t+i] = x[t] @ W[i]  ==  conv(dilate_2(x), kernel[k] = W[1-k],
    padding (1,1)).
    """
    _, _, cout, cin = w.shape
    if impl is None:
        impl = _CONVT_IMPL
    if impl == "grouped" and s_in > 1:
        # fold slot r_i's two output slots r_o = 2*r_i + j are
        # lane-adjacent, so feature_group_count=s_in expresses the block
        # structure exactly: kernel = the same (2, cin, 2*cout) block
        # tiled per group — NO structural blow-up (dense executes s_in x).
        bk = jnp.transpose(w[::-1], (0, 3, 1, 2)).reshape(2, cin, 2 * cout)
        kern = jnp.tile(bk[:, None], (1, 1, 1, s_in)).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding=((1, 1), (0, 0)),
            lhs_dilation=(2, 1), feature_group_count=s_in,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    e = jnp.asarray(_convT_fold_embedding(s_in))
    # kernel[k, 0, r_i*cin+ci, r_o*cout+co] = w[1-k, j, co, ci] E[r_i, j, r_o]
    kern = jnp.einsum("rjq,kjoc->krcqo", e, w[::-1])
    kern = kern.reshape(2, 1, s_in * cin, 2 * s_in * cout).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=((1, 1), (0, 0)),
        lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------------------
# Mixed (2x2 time-x-frequency) fold — the L1 level's lowest-FLOP layout.
#
# Lane layout: lane = (t_slot, f_slot, c) over a (B, T/2, F/2) grid; slot
# (rt, rf) of grid cell (tg, fg) holds logical position (2*tg + rt,
# 2*fg + rf). The conv pair applies the phase trick INDEPENDENTLY in both
# axes: conv1's output slot (rt, rf) of cell (tg, fg) holds logical
# (2*tg + rt - 1, 2*fg + rf - 1), reached with a (2, 2) grid kernel (the
# 2D phase embedding is the tensor product of two 1D s=2 embeddings), and
# conv2 shifts back. Executed FLOPs per 3x3 conv: (2*2 taps) * (4C)^2 per
# grid cell = 16/9 of the logical conv — vs 8/3 for the freq-fold-4 phase
# pair — at full lane utilization. Out-of-range boundary slots (first/last
# grid row for the time phase, first/last column for the frequency phase)
# are zeroed between the convs and excluded from train BN statistics, so
# numerics are EXACT (pinned in tests/test_folded.py).
# ---------------------------------------------------------------------------


def mixed_fold_input(x: jax.Array) -> jax.Array:
    """(B, T, F, C) -> (B, T//2, F//2, 4*C), lane = (t_slot, f_slot, c).
    A real transpose — only used on the tiny pre-conv input (C == 1)."""
    b, t, f, c = x.shape
    x = x.reshape(b, t // 2, 2, f // 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, t // 2, f // 2, 4 * c)


def mixed_unfold(x: jax.Array) -> jax.Array:
    """Inverse of mixed_fold_input (testing aid)."""
    b, tg, fg, sc = x.shape
    c = sc // 4
    x = x.reshape(b, tg, fg, 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, 2 * tg, 2 * fg, c)


def _phase2d_kernel(w: jax.Array,
                    up: bool,
                    in_groups: Optional[Sequence[int]]) -> jax.Array:
    """(3, 3, Cin, Cout) logical -> (2, 2, 4*Cin, 4*Cout) mixed-phase
    kernel: tensor product of the 1D s=2 phase embeddings over the time
    and frequency axes."""
    kh, kw, cin_total, cout = w.shape
    assert kh == 3 and kw == 3
    e = jnp.asarray(_phase_embedding(2, 3, up))
    groups = list(in_groups) if in_groups else [cin_total]
    parts = []
    ci0 = 0
    for cg in groups:
        wg = w[:, :, ci0:ci0 + cg]
        ci0 += cg
        # Et[a=tt, i=rit, r=rot, f=dft], Ef[b=tf, j=rif, s=rof, g=dff]
        kg = jnp.einsum("airf,bjsg,fgcd->abijcrsd", e, e, wg)
        parts.append(kg.reshape(2, 2, 4 * cg, 4 * cout))
    return jnp.concatenate(parts, axis=2)


def mixed_conv_phase(x: jax.Array, w: jax.Array, up: bool,
                     in_groups: Optional[Sequence[int]] = None) -> jax.Array:
    """One half of the mixed-fold phase pair. down: (B, Tg, Fg, 4*Cin) ->
    (B, Tg+1, Fg+1, 4*Cout) phase-shifted (grid padding (1, 1) both axes);
    up: phase-shifted -> phase-0 at (B, Tg, Fg, 4*Cout), no padding. The
    caller MUST zero the out-of-range slots (mixed_garbage_mask) between
    down and up."""
    kern = _phase2d_kernel(w, up, in_groups).astype(x.dtype)
    pad = (0, 0) if up else (1, 1)
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=(pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.lru_cache(maxsize=None)
def mixed_garbage_mask(tg: int, fg: int, lanes: int) -> np.ndarray:
    """(1, tg, fg, lanes) 0/1 mask zeroing the phase-shifted slots whose
    logical (t, f) position is out of range: t_slot 0 of the first grid
    row / t_slot 1 of the last, f_slot 0 of the first column / f_slot 1
    of the last."""
    mt, mf = mixed_garbage_mask_factors(tg, fg, lanes)
    return mt * mf


@functools.lru_cache(maxsize=None)
def mixed_garbage_mask_factors(tg: int, fg: int, lanes: int
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """The garbage mask as its exact outer-product factorization
    (time factor (1, tg, 1, lanes), freq factor (1, 1, fg, lanes)).
    Applying the two broadcastable factors sequentially avoids
    materializing the (tg, fg, lanes) product — profiled ~14 ms of
    constant DMA per forward for the B=16 L1 blocks."""
    c = lanes // 4
    mt = np.ones((1, tg, 1, 2, 2, c), np.float32)
    mt[:, 0, :, 0] = 0.0
    mt[:, tg - 1, :, 1] = 0.0
    mf = np.ones((1, 1, fg, 2, 2, c), np.float32)
    mf[:, :, 0, :, 0] = 0.0
    mf[:, :, fg - 1, :, 1] = 0.0
    return (mt.reshape(1, tg, 1, lanes), mf.reshape(1, 1, fg, lanes))


@functools.lru_cache(maxsize=None)
def _mixed_pool_kernel(c: int) -> np.ndarray:
    """(1, 2, 4*c, 2*c) constant: G-stride-2 conv averaging each grid
    cell's four (t_slot, f_slot) copies into the fold-2 output lane of
    the matching frequency parity."""
    p = np.zeros((2, 4 * c, 2 * c), np.float32)
    eye = 0.25 * np.eye(c, dtype=np.float32)
    for r in range(2):
        for slot in range(4):
            p[r, slot * c:(slot + 1) * c, r * c:(r + 1) * c] += eye
    return p[None]


def mixed_avg_pool_to_fold2(x: jax.Array) -> jax.Array:
    """2x2 avg pool on a mixed tensor: the four pooled positions are
    exactly one grid cell's slots, so pooling is a G-stride-2 conv whose
    kernel both averages the slots AND routes each input column to its
    fold-2 output lane — emitting the L2 level's fold-2 frequency layout
    (B, Tg, Fg//2, 2*C) directly. (The lane-contraction + fold_freq
    form needs a lane-crossing reshape (C -> 2C minor) that XLA
    implements as full-tensor retiling copies, profiled ~5 ms at B=16.)
    """
    c = x.shape[-1] // 4
    kern = jnp.asarray(_mixed_pool_kernel(c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def mixed_convT_2x2(x: jax.Array, w: jax.Array) -> jax.Array:
    """kernel==stride (2, 2) transposed conv from the L2 fold-2 frequency
    layout (B, Tg, G, 2*Cin) straight into the L1 mixed layout
    (B, Tg, 2*G, 4*Cout). Every input cell's four output positions live
    in ONE mixed cell's slots, so frequency upsampling is purely a
    channel mapping; the factor-2 column growth is emitted as a G-axis
    lhs-dilated conv writing the interleaved output DIRECTLY (the 1x1
    conv + (2*G, 4*Cout) reshape form crosses the lane tiling and cost
    ~10 ms of retiling copies at B=16, exactly like the time axis in
    folded_convT_2x2). With lhs_dilation 2 and padding (1, 1), kernel
    tap k serves output column parity q = 1 - k.
    w: (2, 2, Cout, Cin) (the conv_transpose2d param layout)."""
    _, _, cout, cin = w.shape
    eye = jnp.asarray(np.eye(2, dtype=np.float32))
    # blocks[q, (r, ci), (i, j, o)] = W[i, j, o, ci] * delta(r, q)
    blocks = jnp.einsum("rq,ijoc->qrcijo", eye, w)
    blocks = blocks.reshape(2, 2 * cin, 4 * cout)
    kern = jnp.stack([blocks[1], blocks[0]], axis=0)[None]
    return jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), window_strides=(1, 1),
        padding=((0, 0), (1, 1)), lhs_dilation=(1, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def mixed_after_conv_transposed(x: jax.Array, w: jax.Array,
                                bias: jax.Array) -> jax.Array:
    """The mask-head 1x1 conv on the mixed layout, emitted as a
    transposed-output dot exactly like folded_after_conv_transposed:
    (B, Tg, Fg, 4*Cin) x (1, 1, Cin, J) -> unfolded (B, T, F, J)."""
    b, tg, fg, _ = x.shape
    j = w.shape[-1]
    w2d = fold_conv_kernel(w, 4)[0, 0]              # (4*Cin, M), m=slot*J+jj
    m = w2d.shape[1]
    perm = np.arange(m).reshape(4, j).T.reshape(-1)  # m' = jj*4 + (rt,rf)
    w2d = w2d[:, perm].astype(x.dtype)
    bias_f = jnp.tile(bias, 4)[perm].astype(jnp.float32)
    l = jax.lax.dot_general(
        w2d.T, x, dimension_numbers=(((1,), (3,)), ((), ())),
        preferred_element_type=jnp.float32)          # (M, B, Tg, Fg)
    l = (l + bias_f[:, None, None, None]).astype(x.dtype)
    l = l.reshape(j, 2, 2, b, tg, fg)                # (jj, rt, rf, B, Tg, Fg)
    l = jnp.transpose(l, (3, 4, 1, 5, 2, 0))         # (B, Tg, rt, Fg, rf, jj)
    return l.reshape(b, 2 * tg, 2 * fg, j)


class MixedConvBlockRes(nn.Module):
    """ConvBlockRes on the L1 mixed 2x2 time-x-frequency fold layout.

    Identical param tree to ConvBlockRes / FoldedConvBlockRes
    (bn1/bn2/conv1/conv2[/shortcut]); both 3x3 convs run as the 2D
    phase-shifted (2, 2)-kernel pair at 16/9 of the logical FLOPs. The
    garbage mask both restores zero-pad semantics (multiply before the
    up conv) and excludes the boundary slots from bn2's TRAIN batch
    statistics, so numerics are EXACT (pinned in tests/test_folded.py)."""

    in_channels: int
    out_channels: int
    in_groups: Optional[Tuple[int, ...]] = None
    momentum: float = 0.01

    @nn.compact
    def __call__(self, x: jax.Array, film, train: bool) -> jax.Array:
        groups = self.in_groups
        h = folded_bn_film_act(
            x, 4, self.in_channels,
            BatchNorm(self.in_channels, self.momentum, name="bn1"),
            film["beta1"], train, in_groups=groups)
        w1, _ = ConvParams((3, 3, self.in_channels, self.out_channels),
                           name="conv1")()
        h = mixed_conv_phase(h, w1, up=False, in_groups=groups)
        if _CONV_BARRIER == "pre_act":
            h = jax.lax.optimization_barrier(h)
        # the mask applies as its two broadcastable outer-product factors
        # so the (tg, fg, lanes) product (33 MB at B=16 shapes) never
        # materializes as a constant
        mt, mf = mixed_garbage_mask_factors(h.shape[1], h.shape[2],
                                            h.shape[3])
        h = folded_bn_film_act(
            h, 4, self.out_channels,
            BatchNorm(self.out_channels, self.momentum, name="bn2"),
            film["beta2"], train,
            stats_mask=(mt, mf) if train else None)
        if _CONV_BARRIER == "post_act":
            h = jax.lax.optimization_barrier(h)
        h = h * jnp.asarray(mt).astype(h.dtype)
        h = h * jnp.asarray(mf).astype(h.dtype)
        w2, _ = ConvParams((3, 3, self.out_channels, self.out_channels),
                           name="conv2")()
        h = mixed_conv_phase(h, w2, up=True)
        if self.in_channels != self.out_channels:
            ws, bs = ConvParams((1, 1, self.in_channels, self.out_channels),
                                use_bias=True, name="shortcut")()
            return folded_conv(x, ws, 4, bias=bs, in_groups=groups) + h
        return x + h


class MixedEncoderBlockRes1B(nn.Module):
    """EncoderBlockRes1B on the mixed L1 layout; the 2x2 pool is one lane
    contraction and the pooled output lands directly in the L2 level's
    fold-2 frequency layout."""

    in_channels: int
    out_channels: int
    momentum: float = 0.01

    @nn.compact
    def __call__(self, x: jax.Array, film, train: bool):
        encoded = MixedConvBlockRes(
            self.in_channels, self.out_channels, momentum=self.momentum,
            name="conv_block1")(x, film["conv_block1"], train)
        return mixed_avg_pool_to_fold2(encoded), encoded


class MixedDecoderBlockRes1B(nn.Module):
    """DecoderBlockRes1B from the L2 fold-2 frequency layout into the L1
    mixed layout (the model's decoder_block6 when L1 runs mixed). The
    (2, 2) transposed conv is a single 1x1 channel-map conv
    (mixed_convT_2x2). Identical param tree (bn1/conv1/conv_block2)."""

    in_channels: int
    out_channels: int
    skip_channels: int
    momentum: float = 0.01

    @nn.compact
    def __call__(self, x: jax.Array, skip_mixed: jax.Array, film,
                 train: bool) -> jax.Array:
        bn1 = BatchNorm(self.in_channels, self.momentum, name="bn1")
        h = folded_bn_film_act(x, 2, self.in_channels, bn1,
                               film["beta1"], train)
        wt, _ = ConvParams((2, 2, self.out_channels, self.in_channels),
                           name="conv1")()
        h = mixed_convT_2x2(h, wt)
        h = jnp.concatenate([h, skip_mixed.astype(h.dtype)], axis=-1)
        return MixedConvBlockRes(
            self.out_channels + self.skip_channels, self.out_channels,
            in_groups=(self.out_channels, self.skip_channels),
            momentum=self.momentum,
            name="conv_block2")(h, film["conv_block2"], train)


class ConvParams(nn.Module):
    """Parameter-only conv (same param tree as nn.Conv: kernel [+ bias])."""

    shape: Tuple[int, int, int, int]  # (kh, kw, Cin, Cout)
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", xavier_uniform(), self.shape)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.shape[-1],)) if self.use_bias else None
        return kernel, bias


def fold_feature_map(s: int, groups: Sequence[int]) -> np.ndarray:
    """Physical-folded-channel -> logical-channel index map for fold s over
    (possibly concatenated) groups of logical channels."""
    fm = []
    off = 0
    for cg in groups:
        for _r in range(s):
            fm.extend(range(off, off + cg))
        off += cg
    return np.asarray(fm, np.int32)


def folded_bn_film_act(x: jax.Array, s: int, c: int, bn: BatchNorm,
                       beta: jax.Array, train: bool,
                       in_groups: Optional[Sequence[int]] = None,
                       stats_mask: Optional[np.ndarray] = None
                       ) -> jax.Array:
    """BN + FiLM beta + leaky-relu directly on the folded layout via
    BatchNorm's feature_map (no reshape of the big activation, so no
    layout copies). The channel layout in == layout out (grouped stays
    grouped; downstream convs use matching in_groups kernels).

    stats_mask: 0/1 array excluding positions from the TRAIN batch
    statistics (the phase-shifted layout's out-of-range boundary slots);
    the valid slots are a permutation of the logical positions, so the
    masked stats equal the unfolded reference's EXACTLY."""
    fm = fold_feature_map(s, in_groups or [c])
    h = bn(x, train, feature_map=fm, stats_mask=stats_mask)
    h = h + beta[:, fm][:, None, None, :].astype(h.dtype)
    return leaky_relu(h)


class FoldedConvBlockRes(nn.Module):
    """ConvBlockRes (nn/blocks.py) running on fold-s tensors; identical
    param tree (bn1/bn2/conv1/conv2[/shortcut])."""

    in_channels: int
    out_channels: int
    fold: int
    in_groups: Optional[Tuple[int, ...]] = None
    kernel_size: Tuple[int, int] = (3, 3)
    momentum: float = 0.01
    # block-sparse fused act+conv Pallas kernel (ops/pallas_folded_conv):
    # None = auto (eval forward on TPU backends), True forces (tests run
    # interpret off-TPU), False disables.
    use_sparse_kernel: Optional[bool] = None
    # int8 MXU conv execution (eval-only): None = LASS_TPU_QUANT env,
    # True/False force. Requires calibrated 'quant' scales (ops/quant.py).
    quantize: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, film, train: bool) -> jax.Array:
        s = self.fold
        groups = self.in_groups

        backend = jax.default_backend()
        # default OFF: first cut measured 74.5 ms vs 54.2 ms XLA for the
        # full forward (small tiles + VPU staging dominate) — opt-in via
        # use_sparse_kernel=True until the kernel beats the XLA convs
        sparse = (not train and self.kernel_size == (3, 3)
                  and self.use_sparse_kernel is True)
        if sparse:
            return self._sparse_kernel_path(
                x, film, interpret=backend not in ("tpu", "axon"))

        # Fused-kernel path: measured SLOWER than XLA's conv fusions on
        # v5e (110 ms vs 83 ms per 16-clip forward — the halo-window
        # materialization and 34x128 @ 128x128 per-tile matmuls lose to
        # XLA's pipelined convolutions), so it is opt-in for now. The flag
        # is latched at import (module constant) so it cannot flip between
        # traces of the same program.
        if (_FUSED_CONV_BLOCK
                and not train and groups is None
                and self.in_channels == self.out_channels
                and self.kernel_size == (3, 3)
                and jax.default_backend() in ("tpu", "axon")
                and x.shape[1] % 32 == 0):
            # eval fast path: whole residual block in one fused Pallas
            # kernel (lass_tpu.ops.pallas_convblock)
            from lass_tpu.ops.pallas_convblock import (
                fused_residual_conv_block)

            fm = fold_feature_map(s, [self.in_channels])
            inv1, sh1 = BatchNorm(self.in_channels, self.momentum,
                                  name="bn1")(None, False, feature_map=fm,
                                              return_affine=True)
            inv2, sh2 = BatchNorm(self.out_channels, self.momentum,
                                  name="bn2")(None, False, feature_map=fm,
                                              return_affine=True)
            w1, _ = ConvParams((*self.kernel_size, self.in_channels,
                                self.out_channels), name="conv1")()
            w2, _ = ConvParams((*self.kernel_size, self.out_channels,
                                self.out_channels), name="conv2")()
            batch = x.shape[0]
            # beta adds AFTER normalization (pre-activation), so the fused
            # shift is shift_bn + beta
            a1 = jnp.broadcast_to(inv1[None], (batch, len(fm)))
            b1 = sh1[None] + film["beta1"][:, fm].astype(jnp.float32)
            a2 = jnp.broadcast_to(inv2[None], (batch, len(fm)))
            b2 = sh2[None] + film["beta2"][:, fm].astype(jnp.float32)
            return fused_residual_conv_block(
                x, fold_conv_kernel(w1, s), fold_conv_kernel(w2, s),
                a1, b1, a2, b2, t_tile=32)

        h = folded_bn_film_act(
            x, s, self.in_channels,
            BatchNorm(self.in_channels, self.momentum, name="bn1"),
            film["beta1"], train, in_groups=groups)
        return self._xla_tail(x, h, film, train)

    def _sparse_kernel_path(self, x, film, interpret: bool) -> jax.Array:
        """Eval forward via the block-sparse fused act+conv kernel
        (ops/pallas_folded_conv): each conv consumes the RAW previous
        tensor and applies its BN-affine + FiLM beta + leaky in VMEM.
        Identical param tree to the XLA path."""
        from lass_tpu.ops.pallas_folded_conv import fused_act_folded_conv

        s = self.fold
        groups = self.in_groups
        batch = x.shape[0]
        g1 = tuple(groups) if groups else (self.in_channels,)

        def run_conv(xin, bn_name, channels, beta, conv_name, grp):
            """One fused act+conv. Inputs with C < 128 lanes (one group)
            are refolded deeper first — fold-s of C channels IS
            fold-(k*s) of C/k channels under a free reshape — because the
            kernel's HBM DMA needs a 128-aligned lane dim."""
            s_eff, xe = s, xin
            c_f = xin.shape[-1]
            k = 1
            if (len(grp) == 1 and c_f < 128 and 128 % c_f == 0
                    and xin.shape[2] % (128 // c_f) == 0):
                k = 128 // c_f
                s_eff, xe = s * k, fold_freq(xin, k)
            bn = BatchNorm(channels, self.momentum, name=bn_name)
            w, _ = ConvParams((*self.kernel_size, channels,
                               self.out_channels), name=conv_name)()
            in_g = grp if len(grp) > 1 else None
            if xe.shape[-1] % 128:
                # lane dim not DMA-alignable: XLA fallback for this conv
                h = folded_bn_film_act(xin, s, channels, bn, beta, False,
                                       in_groups=in_g)
                return folded_conv(h, w, s, in_groups=in_g)
            fm = fold_feature_map(s_eff, grp)
            inv, sh = bn(None, False, feature_map=fm, return_affine=True)
            a = jnp.broadcast_to(inv[None], (batch, len(fm)))
            bvec = sh[None] + beta[:, fm].astype(jnp.float32)
            y = fused_act_folded_conv(
                xe, fold_conv_kernel(w, s_eff, in_g),
                a, bvec, s_eff, grp, interpret=interpret)
            return unfold_freq(y, k) if k > 1 else y

        h = run_conv(x, "bn1", self.in_channels, film["beta1"], "conv1", g1)
        h = run_conv(h, "bn2", self.out_channels, film["beta2"], "conv2",
                     (self.out_channels,))

        if self.in_channels != self.out_channels:
            ws, bs = ConvParams((1, 1, self.in_channels, self.out_channels),
                                use_bias=True, name="shortcut")()
            return folded_conv(x, ws, s, bias=bs, in_groups=groups) + h
        return x + h

    def _xla_tail(self, x, h, film, train):
        s = self.fold
        groups = self.in_groups
        conv3 = {"dense": folded_conv,
                 "halo": folded_conv_halo,
                 "phase": folded_conv,
                 "decomposed": folded_conv_decomposed}[_CONV_IMPL]
        # Phase-shifted conv pair: conv1 writes a half-group
        # phase-shifted fold layout, conv2 shifts back — each a plain
        # dense conv at 2/3 the folded-kernel FLOPs. In train mode bn2
        # excludes the s out-of-range boundary slots from its batch
        # statistics (stats_mask), making stats/normalization/gradients
        # EXACTLY equal to the dense pair's (pinned in tests/test_folded).
        phase = (_CONV_IMPL == "phase" and s > 1
                 and self.kernel_size == (3, 3))
        # int8 quantized eval (ops/quant.py): observers are created (and
        # recorded) whenever quantization is enabled; the int8 convs run
        # only outside calibration passes (mutable 'quant' = calibrating,
        # which includes .init) and never in train mode.
        quant = ((self.quantize if self.quantize is not None else _QUANT)
                 and not train and phase)
        if quant:
            from lass_tpu.ops import quant as Q
            obs1 = Q.amax_observer(self, "conv1_in", h.shape[-1])
            obs2 = Q.amax_observer(self, "conv2_in",
                                   s * self.out_channels)
            obs_s = (Q.amax_observer(self, "shortcut_in", x.shape[-1])
                     if self.in_channels != self.out_channels else None)
            int8 = not self.is_mutable_collection("quant")
        else:
            int8 = False
        # layout preserved: grouped input needs the grouped folded kernel
        w1, _ = ConvParams((*self.kernel_size, self.in_channels,
                            self.out_channels), name="conv1")()
        kh = self.kernel_size[0]
        if quant:
            scale1 = obs1.record(h)
        if int8:
            from lass_tpu.ops import quant as Q

            def kern1():
                return _phase_kernel(w1, s, False, groups)

            h = Q.qconv(self, "conv1_q", h, kern1, scale1,
                        padding=((kh // 2, kh // 2), (1, 1)))
        elif phase:
            h = folded_conv_phase(h, w1, s, up=False, in_groups=groups)
        else:
            h = conv3(h, w1, s, in_groups=groups)
        # keep conv1 and conv2 in SEPARATE fusions: at B=24 XLA fused the
        # conv1->act->conv2 chain into one kOutput fusion scheduled with
        # EmitAllBatchInSublanes at 18.3M cycles (~12.6 ms vs ~4.8 expected,
        # profiled) — the barrier blocks the double-conv fusion while the
        # act+conv input fusions still form on each side
        if _CONV_BARRIER == "pre_act":
            h = jax.lax.optimization_barrier(h)
        mask = (phase_garbage_mask(s, h.shape[2], h.shape[3])
                if phase else None)
        h = folded_bn_film_act(
            h, s, self.out_channels,
            BatchNorm(self.out_channels, self.momentum, name="bn2"),
            film["beta2"], train,
            stats_mask=mask if (phase and train) else None)
        if _CONV_BARRIER == "post_act":
            h = jax.lax.optimization_barrier(h)
        w2, _ = ConvParams((*self.kernel_size, self.out_channels,
                            self.out_channels), name="conv2")()
        if phase:
            h = h * jnp.asarray(mask).astype(h.dtype)
            if quant:
                scale2 = obs2.record(h)
            if int8:
                from lass_tpu.ops import quant as Q

                def kern2():
                    return _phase_kernel(w2, s, True, None)

                h = Q.qconv(self, "conv2_q", h, kern2, scale2,
                            padding=((kh // 2, kh // 2), (0, 0)))
            else:
                h = folded_conv_phase(h, w2, s, up=True)
        else:
            h = conv3(h, w2, s)
        if self.in_channels != self.out_channels:
            ws, bs = ConvParams((1, 1, self.in_channels, self.out_channels),
                                use_bias=True, name="shortcut")()
            if quant:
                scale_s = obs_s.record(x)
            if int8:
                from lass_tpu.ops import quant as Q

                def kern_s():
                    return fold_conv_kernel(ws, s, groups)

                return Q.qconv(self, "shortcut_q", x, kern_s, scale_s,
                               padding="SAME", bias=jnp.tile(bs, s)) + h
            return folded_conv(x, ws, s, bias=bs, in_groups=groups) + h
        return x + h


class FoldedEncoderBlockRes1B(nn.Module):
    """EncoderBlockRes1B on fold-s input with (2,2) pooling; returns
    (pooled at fold s//2, skip at fold s)."""

    in_channels: int
    out_channels: int
    fold: int
    kernel_size: Tuple[int, int] = (3, 3)
    momentum: float = 0.01
    use_sparse_kernel: Optional[bool] = None
    quantize: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, film, train: bool):
        encoded = FoldedConvBlockRes(
            self.in_channels, self.out_channels, self.fold,
            kernel_size=self.kernel_size, momentum=self.momentum,
            use_sparse_kernel=self.use_sparse_kernel,
            quantize=self.quantize,
            name="conv_block1")(x, film["conv_block1"], train)
        return folded_avg_pool_2x2(encoded, self.fold), encoded


class FoldedDecoderBlockRes1B(nn.Module):
    """DecoderBlockRes1B whose upsampled output + skip concat run folded.

    Input x is UNFOLDED (B, T2, F2, in_channels); skip is fold-(2*fold_in)
    of skip_channels. Identical param tree (bn1/conv1/conv_block2).
    """

    in_channels: int
    out_channels: int
    skip_channels: int
    fold_in: int  # fold applied to the input before the transposed conv
    input_is_folded: bool = False  # x already arrives at fold_in layout
    kernel_size: Tuple[int, int] = (3, 3)
    momentum: float = 0.01
    use_sparse_kernel: Optional[bool] = None
    # fused bn1+beta+leaky+convT Pallas kernel (ops/pallas_convt): None =
    # auto (eval forward on TPU backends; XLA cannot fuse the act chain
    # into the lhs-dilated convT operand, leaving a standalone HBM-bound
    # elementwise fusion), True forces (tests run interpret off-TPU),
    # False disables.
    use_fused_convT: Optional[bool] = None
    # int8 MXU conv execution (eval-only, ops/quant.py): None = env.
    quantize: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, skip_folded: jax.Array, film,
                 train: bool) -> jax.Array:
        bn1 = BatchNorm(self.in_channels, self.momentum, name="bn1")
        wt, _ = ConvParams((2, 2, self.out_channels, self.in_channels),
                           name="conv1")()
        backend = jax.default_backend()
        xf = x if (self.input_is_folded or self.fold_in == 1) \
            else fold_freq(x, self.fold_in)
        quant = ((self.quantize if self.quantize is not None else _QUANT)
                 and not train)
        fused = (not train and not quant
                 and self.use_fused_convT is not False
                 and (self.use_fused_convT is True
                      or (_FUSED_CONVT and backend in ("tpu", "axon")))
                 and xf.shape[-1] % 128 == 0 and xf.shape[2] % 8 == 0)
        if fused:
            from lass_tpu.ops.pallas_convt import fused_act_convT

            fm = fold_feature_map(self.fold_in, [self.in_channels])
            inv, shift = bn1(None, False, feature_map=fm,
                             return_affine=True)
            beta = film["beta1"][:, fm]
            e = jnp.asarray(_convT_fold_embedding(self.fold_in))
            kern = jnp.einsum("rjq,kjoc->krcqo", e, wt[::-1])
            cl = xf.shape[-1]
            w_pair = kern.reshape(2, cl, 2 * self.fold_in
                                  * self.out_channels)[::-1]
            h = fused_act_convT(
                xf, inv, shift, beta, w_pair,
                interpret=backend not in ("tpu", "axon"))
        else:
            if self.input_is_folded and self.fold_in > 1:
                h = folded_bn_film_act(x, self.fold_in, self.in_channels,
                                       bn1, film["beta1"], train)
            else:
                h = bn1(x, train) \
                    + film["beta1"][:, None, None, :].astype(x.dtype)
                h = leaky_relu(h)
                h = fold_freq(h, self.fold_in) if self.fold_in > 1 else h
            if quant:
                from lass_tpu.ops import quant as Q
                scale_t = Q.amax_observer(
                    self, "convt_in", h.shape[-1]).record(h)
                if not self.is_mutable_collection("quant"):
                    def kern():
                        e = jnp.asarray(_convT_fold_embedding(self.fold_in))
                        k = jnp.einsum("rjq,kjoc->krcqo", e, wt[::-1])
                        return k.reshape(2, 1, self.fold_in * wt.shape[-1],
                                         2 * self.fold_in * wt.shape[-2])

                    h = Q.qconv(self, "convt_q", h, kern, scale_t,
                                padding=((1, 1), (0, 0)),
                                lhs_dilation=(2, 1))
                else:
                    h = folded_convT_2x2(h, wt.astype(h.dtype),
                                         self.fold_in)
            else:
                h = folded_convT_2x2(h, wt.astype(h.dtype), self.fold_in)
        s_out = 2 * self.fold_in
        h = jnp.concatenate([h, skip_folded.astype(h.dtype)], axis=-1)
        return FoldedConvBlockRes(
            self.out_channels + self.skip_channels, self.out_channels,
            s_out, in_groups=(self.out_channels, self.skip_channels),
            kernel_size=self.kernel_size, momentum=self.momentum,
            use_sparse_kernel=self.use_sparse_kernel,
            quantize=self.quantize,
            name="conv_block2")(h, film["conv_block2"], train)
