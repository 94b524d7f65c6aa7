"""Core layers with exact PyTorch numerical semantics.

The separation model's parity with the reference (resunet.py, base.py) hinges
on BatchNorm details PyTorch and stock Flax disagree on:

- torch momentum m means ``running = (1 - m) * running + m * batch``
  (reference uses m=0.01, resunet.py:276);
- torch updates running_var with the UNBIASED batch variance but normalizes
  activations with the BIASED one;
- eps = 1e-5.

So we implement BatchNorm ourselves instead of using flax.linen.BatchNorm.
Stats are computed in float32 regardless of the activation dtype. Under
jit/GSPMD with the batch axis sharded over the mesh, the global-batch mean
below IS the cross-replica sync — XLA inserts the collectives — giving exact
`sync_batchnorm: True` parity (reference train.py:278) with zero extra code.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

xavier_uniform = nn.initializers.xavier_uniform


class BatchNorm(nn.Module):
    """Torch-semantics batch normalization over an arbitrary feature axis."""

    features: int
    momentum: float = 0.01
    eps: float = 1e-5
    axis: int = -1

    @nn.compact
    def __call__(self, x: Optional[jax.Array], train: bool,
                 feature_map=None, return_affine: bool = False,
                 stats_mask: Optional[np.ndarray] = None):
        """feature_map: optional static int array of length
        x.shape[axis] mapping each physical channel to a logical feature in
        [0, features). Used by the frequency-folded execution
        (lass_tpu.ops.folded) where s folded copies of each logical channel
        live along the channel axis — statistics and normalization are
        computed EXACTLY as if the tensor were unfolded, without any
        reshape of the large activation.

        return_affine=True (eval only): instead of applying, return the
        per-physical-channel (inv, shift) f32 vectors such that
        y = x * inv + shift — consumed by fused Pallas kernels."""
        if return_affine:
            assert not train
            scale = self.param("scale", nn.initializers.ones,
                               (self.features,))
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            mean = self.variable(
                "batch_stats", "mean",
                lambda: jnp.zeros((self.features,), jnp.float32)).value
            var = self.variable(
                "batch_stats", "var",
                lambda: jnp.ones((self.features,), jnp.float32)).value
            inv = jax.lax.rsqrt(var + self.eps) * scale.astype(jnp.float32)
            shift = bias.astype(jnp.float32) - mean * inv
            if feature_map is not None:
                fm = np.asarray(feature_map)
                inv, shift = inv[fm], shift[fm]
            return inv, shift

        feature_axis = self.axis % x.ndim
        reduction_axes = tuple(i for i in range(x.ndim) if i != feature_axis)
        n_phys = x.shape[feature_axis]
        shape = [1] * x.ndim
        shape[feature_axis] = n_phys

        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if feature_map is None:
            fm = None
            assert n_phys == self.features
        else:
            fm = np.asarray(feature_map)
            assert len(fm) == n_phys

        if train:
            # statistics in f32 (reductions are cheap; accuracy matters)
            xf = x.astype(jnp.float32)
            if stats_mask is None:
                sum_p = jnp.sum(xf, axis=reduction_axes)
                sum2_p = jnp.sum(jnp.square(xf), axis=reduction_axes)
                counts_p = np.full((n_phys,),
                                   x.size / n_phys, np.float64)
            else:
                # masked statistics (phase-shifted folded execution,
                # ops/folded.py): out-of-range boundary slots are
                # excluded, so the stats equal the unfolded reference's
                # EXACTLY (valid slots are a permutation of the logical
                # positions). A tuple/list mask is an outer-product
                # factorization — each broadcastable factor applies
                # sequentially so the full product never materializes as
                # a device constant (mixed-fold layout, 33 MB at B=16).
                factors = (tuple(stats_mask)
                           if isinstance(stats_mask, (tuple, list))
                           else (stats_mask,))
                m_np = np.asarray(factors[0], np.float32)
                for f in factors[1:]:
                    m_np = m_np * np.asarray(f, np.float32)
                assert m_np.ndim == x.ndim
                xm = xf
                x2m = jnp.square(xf)
                for f in factors:
                    fj = jnp.asarray(np.asarray(f, np.float32))
                    xm = xm * fj
                    x2m = x2m * fj
                sum_p = jnp.sum(xm, axis=reduction_axes)
                sum2_p = jnp.sum(x2m, axis=reduction_axes)
                bcast = float(np.prod([
                    x.shape[i] for i in reduction_axes
                    if m_np.shape[i] == 1]))
                counts_p = (m_np.sum(axis=tuple(
                    i for i in range(x.ndim) if i != feature_axis)
                ).astype(np.float64) * bcast)
            if fm is not None:
                # aggregate folded copies into logical features
                onehot_np = (fm[:, None] == np.arange(self.features)[None]
                             ).astype(np.float32)
                onehot = jnp.asarray(onehot_np)
                counts = jnp.asarray(counts_p @ onehot_np)
                mean = (sum_p @ onehot) / counts
                mean2 = (sum2_p @ onehot) / counts
                n_feat = counts_p @ onehot_np
            else:
                mean = sum_p / jnp.asarray(counts_p)
                mean2 = sum2_p / jnp.asarray(counts_p)
                n_feat = counts_p
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = jnp.asarray(n_feat)
                unbiased = var * (n / jnp.maximum(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value \
                    + m * unbiased.astype(jnp.float32)
        else:
            mean, var = ra_mean.value, ra_var.value

        # fold into scale/shift in f32, then apply in the ACTIVATION dtype:
        # avoids materializing f32 copies of large bf16 activations (the
        # per-feature constants stay f32-accurate).
        inv = jax.lax.rsqrt(var + self.eps) * scale.astype(jnp.float32)
        shift = bias.astype(jnp.float32) - mean * inv
        if fm is not None:
            inv = inv[fm]
            shift = shift[fm]
        y = x * inv.reshape(shape).astype(x.dtype) \
            + shift.reshape(shape).astype(x.dtype)
        return y


def conv2d(
    features: int,
    kernel_size: Tuple[int, int] = (3, 3),
    strides: Tuple[int, int] = (1, 1),
    use_bias: bool = True,
    name: Optional[str] = None,
    dtype: Any = None,
) -> nn.Conv:
    """NHWC conv, 'SAME' padding for odd kernels (== torch padding k//2 at
    stride 1), xavier-uniform kernel / zero bias init (reference base.py:9-15).
    """
    return nn.Conv(
        features=features,
        kernel_size=kernel_size,
        strides=strides,
        padding="SAME",
        use_bias=use_bias,
        kernel_init=xavier_uniform(),
        bias_init=nn.initializers.zeros,
        name=name,
        dtype=dtype,
    )


def conv_transpose2d(
    features: int,
    kernel_size: Tuple[int, int],
    strides: Tuple[int, int],
    use_bias: bool = False,
    name: Optional[str] = None,
    dtype: Any = None,
) -> nn.ConvTranspose:
    """Transposed conv with kernel == stride (the reference's upsampling,
    resunet.py:216-224).

    transpose_kernel=True makes the op numerically identical to torch's
    conv_transpose2d with kernel = torch_weight.transpose(2, 3, 1, 0)
    (verified by tests/test_layers.py), so checkpoint conversion is a pure
    transpose. xavier-uniform is symmetric in (fan_in, fan_out) so the init
    distribution matches torch despite the kernel layout difference.
    """
    return nn.ConvTranspose(
        features=features,
        kernel_size=kernel_size,
        strides=strides,
        padding="VALID",
        use_bias=use_bias,
        transpose_kernel=True,
        kernel_init=xavier_uniform(),
        bias_init=nn.initializers.zeros,
        name=name,
        dtype=dtype,
    )


def dense(
    features: int,
    use_bias: bool = True,
    name: Optional[str] = None,
    dtype: Any = None,
) -> nn.Dense:
    return nn.Dense(
        features=features,
        use_bias=use_bias,
        kernel_init=xavier_uniform(),
        bias_init=nn.initializers.zeros,
        name=name,
        dtype=dtype,
    )


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    # max(x, a*x) == where(x >= 0, x, a*x) for 0 < a < 1, and the maximum
    # form fuses into neighboring TPU ops where compare+select does not
    # (profiler showed standalone compare_select fusions costing ~13 ms on
    # a 16-clip forward)
    return jnp.maximum(x, negative_slope * x)


def avg_pool(x: jax.Array, window: Tuple[int, int]) -> jax.Array:
    """Non-overlapping average pool over the (H, W) axes of NHWC input."""
    return nn.avg_pool(x, window_shape=window, strides=window, padding="VALID")
