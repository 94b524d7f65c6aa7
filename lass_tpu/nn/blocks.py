"""ResUNet residual blocks with FiLM conditioning (NHWC).

Behavioral spec: reference resunet.py:84-264. FiLM betas arrive as a nested
dict of (B, C) arrays produced by one fused projection (models/film.py) —
they are added to the BatchNorm output pre-activation, exactly as the
reference does (resunet.py:159-160, 255).
"""
from __future__ import annotations

from typing import Dict, Tuple

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

    @nn.compact
    def __call__(self, x: jax.Array, film: Dict, train: bool) -> jax.Array:
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


class EncoderBlockRes1B(nn.Module):
    in_channels: int
    out_channels: int
    downsample: Tuple[int, int]
    kernel_size: Tuple[int, int] = (3, 3)
    momentum: float = 0.01

    @nn.compact
    def __call__(self, x: jax.Array, film: Dict, train: bool
                 ) -> Tuple[jax.Array, jax.Array]:
        encoded = ConvBlockRes(
            self.in_channels, self.out_channels, self.kernel_size,
            self.momentum, name="conv_block1")(x, film["conv_block1"], train)
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
            self.momentum, name="conv_block2")(h, film["conv_block2"], train)
        return h
