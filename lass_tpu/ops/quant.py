"""Int8 MXU execution of the hot folded convs (eval-only, opt-in).

Why: the v5e MXU runs s8xs8->s32 at 2x the bf16 peak (394 vs 197
TOPS/TFLOPS), and int8 activations halve the HBM bytes of the
memory-bound 1x1/shortcut convs. Profiled on the 10 s / batch-16
forward, the folded L1/L2 conv fusions are ~27 ms of the 43.8 ms
device total — the single biggest remaining lever after the phase-pair
FLOP reduction (see CLAUDE.md perf notes).

Scheme (static post-training quantization, TPU-shaped):
  - activations: symmetric PER-INPUT-LANE int8 with STATIC scales
    calibrated by one forward pass (per-lane max|x| recorded into a flax
    'quant' variable collection — the param tree is untouched, so
    torch-checkpoint conversion is oblivious). Static scales mean the
    quantize op is a pure elementwise epilogue XLA fuses into the
    producing fusion: no extra HBM pass, unlike dynamic (amax-per-batch)
    quantization.
  - channel equalization: the per-lane activation scale s_i is absorbed
    EXACTLY into the float kernel (w'_{i,o} = w_{i,o} * s_i) before
    weight quantization, so sum_i (x_i/s_i)_q8 * (w'_{i,o})_q8 * sw_o
    ~= sum_i x_i w_{i,o}. Folded lanes mix fold slots with very
    different statistics (lane = (fold slot, channel)); per-lane scales
    cost nothing at runtime and cut the quantization error several-fold
    vs per-tensor.
  - weights: symmetric per-output-lane int8, quantized from the FOLDED
    kernel (post phase/fold embedding, post equalization) at apply time;
    exact for the lane's max tap by construction.
  - accumulation: int32 (exact), dequantized by sw[out_lane] in the
    consumer epilogue.

Calibration protocol: `model.apply(vars, calib_batch, train=False,
mutable=['quant'])` runs the FLOAT path while recording amax; the
returned 'quant' collection then drives quantized applies. A flax
module detects calibration via `is_mutable_collection('quant')`.
Amax ACCUMULATES across calibration passes (running max), so feeding
several representative batches tightens coverage — per-lane ranges in
this model are FiLM-conditioned and swing widely across queries, so
multi-batch calibration (or a safety margin, LASS_TPU_QUANT_MARGIN)
matters for held-out inputs.

Quality is guarded on real hardware by bench.py's parity gate vs the
committed CPU float32/HIGHEST golden. Reference behavioral spec:
models/resunet.py (this repo) == reference models/resunet.py:103-241;
the reference has no quantized path (TPU-specific optimization).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_weight(kern: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-lane symmetric int8: kern (kh, kw, K, N) -> (int8 kern,
    f32 scale (N,)). round(|max|/sw) == 127 exactly, so no clip needed."""
    k32 = kern.astype(jnp.float32)
    sw = jnp.max(jnp.abs(k32), axis=(0, 1, 2)) / 127.0
    sw = jnp.maximum(sw, 1e-30)
    kq = jnp.round(k32 / sw).astype(jnp.int8)
    return kq, sw


def quantize_act(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric int8 with static per-lane scales (K,) broadcast over the
    trailing dim (elementwise — fuses into x's producer)."""
    z = x.astype(jnp.float32) * (1.0 / scale)
    return jnp.clip(jnp.round(z), -127.0, 127.0).astype(jnp.int8)


# LASS_TPU_QUANT_IMPL: 'conv' (int8 lax.conv) or 'dot' (sum of shifted
# int8 dot_generals — the hedge if XLA's int8 conv path is slow on the
# target chip; exactly the same int32 accumulation, pinned in tests)
_IMPL = os.environ.get("LASS_TPU_QUANT_IMPL", "conv")


def _conv_int8_dot(xq: jax.Array, kq: jax.Array, padding) -> jax.Array:
    """int8 NHWC conv as sum over kernel taps of int8 matmuls: each tap
    (dt, dg) contributes shifted_x @ W[dt, dg] with int32 accumulation.
    Taps stay separate dots so each runs the MXU's s8xs8->s32 path."""
    kh, kw, _, _ = kq.shape
    (pt0, pt1), (pg0, pg1) = padding
    xp = jnp.pad(xq, ((0, 0), (pt0, pt1), (pg0, pg1), (0, 0)))
    t_out = xp.shape[1] - kh + 1
    g_out = xp.shape[2] - kw + 1
    acc = None
    for dt in range(kh):
        for dg in range(kw):
            win = jax.lax.slice(
                xp, (0, dt, dg, 0),
                (xp.shape[0], dt + t_out, dg + g_out, xp.shape[3]))
            part = jax.lax.dot_general(
                win, kq[dt, dg], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = part if acc is None else acc + part
    return acc


def conv_int8(x: jax.Array, kern, x_scale: jax.Array,
              *, padding, bias: Optional[jax.Array] = None,
              lhs_dilation=None, out_dtype=None,
              packed: Optional[dict] = None) -> jax.Array:
    """NHWC conv with both operands quantized to int8 and int32 MXU
    accumulation; output dequantized to out_dtype (default: x.dtype).

    kern: the float FOLDED kernel (kh, kw, K, N), or a zero-arg callable
    producing it (so the fold/phase einsums are traced only when actually
    needed). x_scale: calibrated per-input-lane activation scales (K,),
    absorbed into the kernel (channel equalization) so the dequant is
    per-output-lane only.

    packed: a pre-quantized {'kq', 'sw'} dict from the 'qpack' collection
    (qconv below). When given, the float kernel is never touched —
    no per-forward quantization compute and no folded float kernel
    residency in the eval graph (the round-3 quant path kept BOTH float
    and int8 kernels live, which is why it OOMed at batch 32)."""
    out_dtype = out_dtype or x.dtype
    if packed is not None:
        kq, sw = packed["kq"], packed["sw"]
        if callable(kern):
            kern = None  # never traced
    else:
        if callable(kern):
            kern = kern()
        kq, sw = quantize_weight(kern.astype(jnp.float32)
                                 * x_scale[None, None, :, None])
    xq = quantize_act(x, x_scale)
    if _IMPL == "dot" and lhs_dilation is None:
        kh, kw = kq.shape[:2]
        pad = (((kh // 2, kh // 2), (kw // 2, kw // 2))
               if padding == "SAME" else padding)
        y = _conv_int8_dot(xq, kq, pad)
    else:
        y = jax.lax.conv_general_dilated(
            xq, kq, window_strides=(1, 1), padding=padding,
            lhs_dilation=lhs_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


_MARGIN = float(os.environ.get("LASS_TPU_QUANT_MARGIN", "1.0"))


class AmaxObserver:
    """Calibrated per-input-lane scales held in the 'quant' collection.

    Usage inside an nn.Module:
        obs = amax_observer(self, 'conv1_in', lanes)
        scale = obs.record(h)   # calibration: accumulates; eval: reads

    Amax accumulates (running max) across calibration passes; scales
    read with a floor (uncalibrated lanes fall back to scale 1) and an
    optional safety margin for held-out range coverage.
    """

    def __init__(self, var, calibrating: bool):
        self._var = var
        self._calibrating = calibrating

    def record(self, x: jax.Array) -> jax.Array:
        if self._calibrating:
            axes = tuple(range(x.ndim - 1))
            self._var.value = jnp.maximum(
                self._var.value,
                jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes))
        amax = jnp.where(self._var.value > 0.0, self._var.value, 127.0)
        return amax * (_MARGIN / 127.0)


def amax_observer(mdl, name: str, lanes: int) -> AmaxObserver:
    calibrating = mdl.is_mutable_collection("quant")
    var = mdl.variable(
        "quant", name, lambda: jnp.zeros((lanes,), jnp.float32))
    return AmaxObserver(var, calibrating)


def _bc_enabled() -> bool:
    return os.environ.get("LASS_TPU_QUANT_BC", "1") != "0"


def qconv(mdl, name: str, x: jax.Array, kern_fn, x_scale: jax.Array,
          *, padding, bias: Optional[jax.Array] = None,
          lhs_dilation=None, out_dtype=None) -> jax.Array:
    """Quantized conv call site: in-graph, packing, or packed execution.

    Protocol (after amax calibration finishes):
      pack:  ``out, qpack = model.apply({..., 'quant': scales}, batch,
             train=False, mutable=['qpack'])`` — each quantized conv
             computes its int8 kernel + per-output-lane scales ONCE from
             the float params and the calibrated activation scales, runs
             the int8 conv, AND records a per-output-lane bias correction
             bc = mean(y_float - y_int8) over the pack batch. Packing is
             sequential by construction: each layer's float reference is
             computed on activations already produced by the quantized
             (and corrected) predecessors, so bc absorbs the accumulated
             DC error of the whole prefix, not just this layer's.
      eval:  pass the returned 'qpack' alongside the variables; convs read
             the int8 kernels directly (float kernels drop out of the
             compiled executable — no per-forward quantize ops, no double
             float+int8 residency) and add bc in the same fused epilogue
             as the dequant scale, so the correction is runtime-free.

    Without a pack, falls back to plain in-graph quantization (identical
    int8 math, no bc). LASS_TPU_QUANT_BC=0 disables the correction, in
    which case packed and in-graph outputs are bit-identical (pinned in
    tests/test_quant.py). Re-pack after any param or calibration change:
    an existing pack is never recomputed.
    """
    packing = mdl.is_mutable_collection("qpack")
    if not packing and not mdl.has_variable("qpack", name):
        return conv_int8(x, kern_fn, x_scale, padding=padding, bias=bias,
                         lhs_dilation=lhs_dilation, out_dtype=out_dtype)

    def init():
        kq, sw = quantize_weight(
            kern_fn().astype(jnp.float32) * x_scale[None, None, :, None])
        return {"kq": kq, "sw": sw, "bc": jnp.zeros_like(sw)}

    var = mdl.variable("qpack", name, init)
    pack = var.value
    out_dtype = out_dtype or x.dtype
    y = conv_int8(x, None, x_scale, padding=padding,
                  lhs_dilation=lhs_dilation, out_dtype=jnp.float32,
                  packed=pack)
    bc = pack.get("bc") if hasattr(pack, "get") else pack["bc"]
    if packing and _bc_enabled():
        y_f = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kern_fn().astype(jnp.float32), (1, 1),
            padding, lhs_dilation=lhs_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bc = jnp.mean(y_f - y, axis=tuple(range(y.ndim - 1)))
        var.value = {"kq": pack["kq"], "sw": pack["sw"], "bc": bc}
    if bc is not None and _bc_enabled():
        y = y + bc
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
