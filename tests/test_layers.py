"""Parity tests: lass_tpu.nn layers vs PyTorch reference semantics."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from lass_tpu.nn.layers import BatchNorm, conv2d, conv_transpose2d, leaky_relu, avg_pool


def to_nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def to_nchw(x):
    return np.ascontiguousarray(np.transpose(np.asarray(x), (0, 3, 1, 2)))


class TestBatchNorm:
    def _make(self, c=6):
        tbn = torch.nn.BatchNorm2d(c, momentum=0.01)
        with torch.no_grad():
            tbn.weight.copy_(torch.randn(c))
            tbn.bias.copy_(torch.randn(c))
            tbn.running_mean.copy_(torch.randn(c))
            tbn.running_var.copy_(torch.rand(c) + 0.5)
        # .copy() matters: jax CPU arrays can zero-copy alias numpy views of
        # torch buffers, which torch then mutates in place during forward.
        jvars = {
            "params": {"scale": jnp.asarray(tbn.weight.detach().numpy().copy()),
                       "bias": jnp.asarray(tbn.bias.detach().numpy().copy())},
            "batch_stats": {"mean": jnp.asarray(tbn.running_mean.numpy().copy()),
                            "var": jnp.asarray(tbn.running_var.numpy().copy())},
        }
        return tbn, jvars

    def test_eval_mode(self, rng):
        tbn, jvars = self._make()
        x = rng.randn(2, 6, 4, 5).astype(np.float32)
        tbn.eval()
        ref = tbn(torch.from_numpy(x)).detach().numpy()
        out = BatchNorm(6).apply(jvars, jnp.asarray(to_nhwc(x)), train=False)
        np.testing.assert_allclose(to_nchw(out), ref, atol=1e-5)

    def test_train_mode_and_running_stats(self, rng):
        tbn, jvars = self._make()
        x = rng.randn(4, 6, 5, 3).astype(np.float32)
        tbn.train()
        ref = tbn(torch.from_numpy(x)).detach().numpy()
        out, updated = BatchNorm(6).apply(
            jvars, jnp.asarray(to_nhwc(x)), train=True,
            mutable=["batch_stats"])
        np.testing.assert_allclose(to_nchw(out), ref, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["var"]),
            tbn.running_var.numpy(), atol=1e-6)

    def test_freq_axis_bn0(self, rng):
        """bn0 normalizes the 513 freq bins (reference resunet.py:537-539)."""
        f = 7
        tbn = torch.nn.BatchNorm2d(f, momentum=0.01)
        tbn.train()
        x = rng.randn(2, 3, 4, f).astype(np.float32)  # jax layout (B,T,F=7? no:)
        # torch path: (B,C,T,F) -> transpose(1,3) -> BN -> transpose back
        xt = torch.from_numpy(np.transpose(x, (0, 3, 2, 1)).copy())  # (B,F,T,C)
        ref = tbn(xt).detach().numpy().transpose(0, 3, 2, 1)
        jvars = {"params": {"scale": jnp.ones(f), "bias": jnp.zeros(f)},
                 "batch_stats": {"mean": jnp.zeros(f), "var": jnp.ones(f)}}
        # jax layout here: (B, C, T, F) with feature axis -1... use axis=3
        out, _ = BatchNorm(f, axis=3).apply(
            jvars, jnp.asarray(x), train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_conv2d_matches_torch(rng):
    x = rng.randn(2, 3, 8, 9).astype(np.float32)
    w = rng.randn(5, 3, 3, 3).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()
    mod = conv2d(5, (3, 3), use_bias=False)
    out = mod.apply(
        {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}},
        jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(to_nchw(out), ref, atol=1e-4)


def test_conv_transpose2d_matches_torch(rng):
    x = rng.randn(2, 3, 4, 6).astype(np.float32)
    w = rng.randn(3, 5, 2, 2).astype(np.float32)  # torch (in, out, kh, kw)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2).numpy()
    mod = conv_transpose2d(5, (2, 2), (2, 2))
    out = mod.apply(
        {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}},
        jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(to_nchw(out), ref, atol=1e-4)


def test_leaky_relu_and_avg_pool(rng):
    x = rng.randn(2, 4, 6, 3).astype(np.float32)
    ref = torch.nn.functional.leaky_relu(
        torch.from_numpy(to_nchw(jnp.asarray(x))), 0.01).numpy()
    np.testing.assert_allclose(to_nchw(leaky_relu(jnp.asarray(x))), ref,
                               atol=1e-6)
    pref = torch.nn.functional.avg_pool2d(
        torch.from_numpy(to_nchw(jnp.asarray(x))), (2, 2)).numpy()
    np.testing.assert_allclose(to_nchw(avg_pool(jnp.asarray(x), (2, 2))),
                               pref, atol=1e-6)
