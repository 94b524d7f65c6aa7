"""Block-level parity: lass_tpu.nn.blocks vs torch oracles implementing the
reference block math (resunet.py:84-264)."""
import numpy as np
import torch
import torch.nn.functional as tF
import jax.numpy as jnp

from lass_tpu.nn.blocks import ConvBlockRes, DecoderBlockRes1B, EncoderBlockRes1B


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)).copy())


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


class TorchConvBlockOracle:
    """Eval-mode oracle for the residual conv block (reference
    resunet.py:147-165), with explicit weights."""

    def __init__(self, rng, cin, cout):
        self.cin, self.cout = cin, cout
        self.bn1_stats = (rng.randn(cin).astype(np.float32),
                          (rng.rand(cin) + 0.5).astype(np.float32))
        self.bn2_stats = (rng.randn(cout).astype(np.float32),
                          (rng.rand(cout) + 0.5).astype(np.float32))
        self.bn1_affine = (rng.randn(cin).astype(np.float32) * 0.1 + 1,
                           rng.randn(cin).astype(np.float32) * 0.1)
        self.bn2_affine = (rng.randn(cout).astype(np.float32) * 0.1 + 1,
                           rng.randn(cout).astype(np.float32) * 0.1)
        self.w1 = (rng.randn(cout, cin, 3, 3) * 0.1).astype(np.float32)
        self.w2 = (rng.randn(cout, cout, 3, 3) * 0.1).astype(np.float32)
        if cin != cout:
            self.ws = (rng.randn(cout, cin, 1, 1) * 0.1).astype(np.float32)
            self.bs = rng.randn(cout).astype(np.float32) * 0.1

    @staticmethod
    def _bn(x, stats, affine):
        mean, var = stats
        w, b = affine
        return tF.batch_norm(x, torch.from_numpy(mean), torch.from_numpy(var),
                             torch.from_numpy(w), torch.from_numpy(b),
                             training=False)

    def __call__(self, x, b1, b2):
        h = tF.leaky_relu(self._bn(x, self.bn1_stats, self.bn1_affine)
                          + torch.from_numpy(b1)[:, :, None, None], 0.01)
        h = tF.conv2d(h, torch.from_numpy(self.w1), padding=1)
        h = tF.leaky_relu(self._bn(h, self.bn2_stats, self.bn2_affine)
                          + torch.from_numpy(b2)[:, :, None, None], 0.01)
        h = tF.conv2d(h, torch.from_numpy(self.w2), padding=1)
        if self.cin != self.cout:
            sc = tF.conv2d(x, torch.from_numpy(self.ws),
                           torch.from_numpy(self.bs))
            return sc + h
        return x + h

    def jax_vars(self):
        p = {
            "bn1": {"scale": jnp.asarray(self.bn1_affine[0]),
                    "bias": jnp.asarray(self.bn1_affine[1])},
            "bn2": {"scale": jnp.asarray(self.bn2_affine[0]),
                    "bias": jnp.asarray(self.bn2_affine[1])},
            "conv1": {"kernel": jnp.asarray(
                np.transpose(self.w1, (2, 3, 1, 0)).copy())},
            "conv2": {"kernel": jnp.asarray(
                np.transpose(self.w2, (2, 3, 1, 0)).copy())},
        }
        if self.cin != self.cout:
            p["shortcut"] = {
                "kernel": jnp.asarray(np.transpose(self.ws, (2, 3, 1, 0)).copy()),
                "bias": jnp.asarray(self.bs)}
        s = {
            "bn1": {"mean": jnp.asarray(self.bn1_stats[0]),
                    "var": jnp.asarray(self.bn1_stats[1])},
            "bn2": {"mean": jnp.asarray(self.bn2_stats[0]),
                    "var": jnp.asarray(self.bn2_stats[1])},
        }
        return p, s


def test_conv_block_res_parity(rng):
    for cin, cout in [(4, 4), (4, 8)]:
        oracle = TorchConvBlockOracle(rng, cin, cout)
        x = rng.randn(2, cin, 6, 8).astype(np.float32)
        b1 = rng.randn(2, cin).astype(np.float32)
        b2 = rng.randn(2, cout).astype(np.float32)
        ref = oracle(torch.from_numpy(x), b1, b2).numpy()
        p, s = oracle.jax_vars()
        out = ConvBlockRes(cin, cout).apply(
            {"params": p, "batch_stats": s}, nhwc(x),
            {"beta1": jnp.asarray(b1), "beta2": jnp.asarray(b2)}, False)
        np.testing.assert_allclose(nchw(out), ref, atol=2e-4)


def test_encoder_block_pools(rng):
    oracle = TorchConvBlockOracle(rng, 4, 8)
    x = rng.randn(2, 4, 6, 8).astype(np.float32)
    b1 = rng.randn(2, 4).astype(np.float32)
    b2 = rng.randn(2, 8).astype(np.float32)
    ref_enc = oracle(torch.from_numpy(x), b1, b2)
    ref_pool = tF.avg_pool2d(ref_enc, (2, 2)).numpy()
    p, s = oracle.jax_vars()
    pool, enc = EncoderBlockRes1B(4, 8, (2, 2)).apply(
        {"params": {"conv_block1": p}, "batch_stats": {"conv_block1": s}},
        nhwc(x),
        {"conv_block1": {"beta1": jnp.asarray(b1), "beta2": jnp.asarray(b2)}},
        False)
    np.testing.assert_allclose(nchw(enc), ref_enc.numpy(), atol=2e-4)
    np.testing.assert_allclose(nchw(pool), ref_pool, atol=2e-4)


def test_decoder_block_parity(rng):
    cin, cout = 8, 4
    oracle = TorchConvBlockOracle(rng, cout * 2, cout)
    bn_stats = (rng.randn(cin).astype(np.float32),
                (rng.rand(cin) + 0.5).astype(np.float32))
    bn_affine = (np.ones(cin, np.float32), np.zeros(cin, np.float32))
    wt = (rng.randn(cin, cout, 2, 2) * 0.1).astype(np.float32)

    x = rng.randn(2, cin, 3, 4).astype(np.float32)
    skip = rng.randn(2, cout, 6, 8).astype(np.float32)
    b1 = rng.randn(2, cin).astype(np.float32)
    cb1 = rng.randn(2, cout * 2).astype(np.float32)
    cb2 = rng.randn(2, cout).astype(np.float32)

    h = tF.batch_norm(torch.from_numpy(x), torch.from_numpy(bn_stats[0]),
                      torch.from_numpy(bn_stats[1]),
                      torch.from_numpy(bn_affine[0]),
                      torch.from_numpy(bn_affine[1]), training=False)
    h = tF.leaky_relu(h + torch.from_numpy(b1)[:, :, None, None], 0.01)
    h = tF.conv_transpose2d(h, torch.from_numpy(wt), stride=2)
    h = torch.cat([h, torch.from_numpy(skip)], dim=1)
    ref = oracle(h, cb1, cb2).numpy()

    p, s = oracle.jax_vars()
    variables = {
        "params": {
            "bn1": {"scale": jnp.asarray(bn_affine[0]),
                    "bias": jnp.asarray(bn_affine[1])},
            "conv1": {"kernel": jnp.asarray(
                np.transpose(wt, (2, 3, 1, 0)).copy())},
            "conv_block2": p,
        },
        "batch_stats": {
            "bn1": {"mean": jnp.asarray(bn_stats[0]),
                    "var": jnp.asarray(bn_stats[1])},
            "conv_block2": s,
        },
    }
    film = {"beta1": jnp.asarray(b1),
            "conv_block2": {"beta1": jnp.asarray(cb1),
                            "beta2": jnp.asarray(cb2)}}
    out = DecoderBlockRes1B(cin, cout, (2, 2)).apply(
        variables, nhwc(x), nhwc(skip), film, False)
    np.testing.assert_allclose(nchw(out), ref, atol=2e-4)
