"""ResUNet residual blocks with FiLM conditioning (NHWC).

Behavioral spec: reference resunet.py:84-264. FiLM betas arrive as a nested
dict of (B, C) arrays produced by one fused projection (models/film.py) —
they are added to the BatchNorm output pre-activation, exactly as the
reference does (resunet.py:159-160, 255).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax

from lass_tpu.nn.layers import (
    BatchNorm,
    avg_pool,
    conv2d,
    conv_transpose2d,
    leaky_relu,
)


def _bcast(beta: jax.Array) -> jax.Array:
    """(B, C) FiLM beta -> broadcastable (B, 1, 1, C) for NHWC."""
    return beta[:, None, None, :]


class ConvBlockRes(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    momentum: float = 0.01
    # int8 MXU conv execution (eval-only, ops/quant.py): None = env
    # LASS_TPU_QUANT. Param tree is IDENTICAL either way (kernel/bias
    # names mirror nn.Conv), so checkpoints are oblivious.
    quantize: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, film: Dict, train: bool) -> jax.Array:
        from lass_tpu.ops.folded import _QUANT

        quant = ((self.quantize if self.quantize is not None else _QUANT)
                 and not train)
        if quant:
            return self._call_quant(x, film)
        # dtype=x.dtype: with the default (None), flax promotes the
        # computation to the f32 param dtype, silently running every conv
        # in 3-pass f32 on the MXU when activations are bf16 (profiled at
        # ~3x the bf16 conv cost). The activation dtype IS the requested
        # compute dtype.
        h = BatchNorm(self.in_channels, self.momentum, name="bn1")(x, train)
        h = leaky_relu(h + _bcast(film["beta1"]).astype(h.dtype))
        h = conv2d(self.out_channels, self.kernel_size, use_bias=False,
                   name="conv1", dtype=x.dtype)(h)
        h = BatchNorm(self.out_channels, self.momentum, name="bn2")(h, train)
        h = leaky_relu(h + _bcast(film["beta2"]).astype(h.dtype))
        h = conv2d(self.out_channels, self.kernel_size, use_bias=False,
                   name="conv2", dtype=x.dtype)(h)
        if self.in_channels != self.out_channels:
            return conv2d(self.out_channels, (1, 1), name="shortcut",
                          dtype=x.dtype)(x) + h
        return x + h

    def _call_quant(self, x: jax.Array, film: Dict) -> jax.Array:
        """Eval-only int8 path: same params (ConvParams mirrors nn.Conv's
        kernel/bias tree), observers in the 'quant' collection. During
        calibration (mutable 'quant', incl. .init) the convs run FLOAT
        with identical semantics to the nn.Conv path above."""
        import jax.numpy as jnp

        from lass_tpu.ops import quant as Q
        from lass_tpu.ops.folded import ConvParams

        int8 = not self.is_mutable_collection("quant")

        def conv(h, kern, scale, pack_name, bias=None):
            if int8:
                return Q.qconv(self, pack_name, h, lambda: kern, scale,
                               padding="SAME", bias=bias)
            y = jax.lax.conv_general_dilated(
                h, kern.astype(h.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y

        w1, _ = ConvParams((*self.kernel_size, self.in_channels,
                            self.out_channels), name="conv1")()
        w2, _ = ConvParams((*self.kernel_size, self.out_channels,
                            self.out_channels), name="conv2")()
        h = BatchNorm(self.in_channels, self.momentum, name="bn1")(x, False)
        h = leaky_relu(h + _bcast(film["beta1"]).astype(h.dtype))
        s1 = Q.amax_observer(self, "conv1_in", self.in_channels).record(h)
        h = conv(h, w1, s1, "conv1_q")
        h = BatchNorm(self.out_channels, self.momentum, name="bn2")(h, False)
        h = leaky_relu(h + _bcast(film["beta2"]).astype(h.dtype))
        s2 = Q.amax_observer(self, "conv2_in", self.out_channels).record(h)
        h = conv(h, w2, s2, "conv2_q")
        if self.in_channels != self.out_channels:
            ws, bs = ConvParams((1, 1, self.in_channels, self.out_channels),
                                use_bias=True, name="shortcut")()
            ss = Q.amax_observer(
                self, "shortcut_in", self.in_channels).record(x)
            return conv(x, ws, ss, "shortcut_q", bias=bs) + h
        return x + h


class EncoderBlockRes1B(nn.Module):
    in_channels: int
    out_channels: int
    downsample: Tuple[int, int]
    kernel_size: Tuple[int, int] = (3, 3)
    momentum: float = 0.01
    quantize: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, film: Dict, train: bool
                 ) -> Tuple[jax.Array, jax.Array]:
        encoded = ConvBlockRes(
            self.in_channels, self.out_channels, self.kernel_size,
            self.momentum, quantize=self.quantize,
            name="conv_block1")(x, film["conv_block1"], train)
        if self.downsample == (1, 1):
            return encoded, encoded
        return avg_pool(encoded, self.downsample), encoded


class DecoderBlockRes1B(nn.Module):
    """Upsample + skip-concat + residual conv block.

    ``skip_channels`` generalizes the reference (where skip == out_channels)
    so the multi-resolution variant's fused skip (reference
    resunet_with_multistft.py:108-118, broken there) works here.
    """

    in_channels: int
    out_channels: int
    upsample: Tuple[int, int]
    skip_channels: int = -1  # -1 => out_channels
    kernel_size: Tuple[int, int] = (3, 3)
    momentum: float = 0.01
    quantize: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, film: Dict,
                 train: bool) -> jax.Array:
        import jax.numpy as jnp

        skip_ch = self.out_channels if self.skip_channels == -1 \
            else self.skip_channels
        h = BatchNorm(self.in_channels, self.momentum, name="bn1")(x, train)
        h = leaky_relu(h + _bcast(film["beta1"]).astype(h.dtype))
        h = conv_transpose2d(self.out_channels, self.upsample, self.upsample,
                             name="conv1", dtype=x.dtype)(h)
        h = jnp.concatenate([h, skip], axis=-1)
        h = ConvBlockRes(
            self.out_channels + skip_ch, self.out_channels, self.kernel_size,
            self.momentum, quantize=self.quantize,
            name="conv_block2")(h, film["conv_block2"], train)
        return h
