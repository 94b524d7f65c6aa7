"""Block-sparse folded conv kernel vs the dense folded-conv oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lass_tpu.ops.folded import fold_conv_kernel
from lass_tpu.ops.pallas_folded_conv import (
    fused_act_folded_conv, pack_weights, reference_act_folded_conv)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _case(rng, b, t, g, s, groups, cout):
    cin = sum(groups)
    c = s * cin
    x = jnp.asarray(rng.randn(b, t, g, c).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    kf = fold_conv_kernel(w, s, in_groups=groups if len(groups) > 1
                          else None)
    a = jnp.asarray(1.0 + 0.1 * rng.randn(b, c).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(b, c).astype(np.float32))
    return x, kf, a, bias


def test_pack_weights_covers_all_nonzeros(rng):
    """The folded kernel has NO nonzeros outside the packed blocks."""
    for s, groups in [(4, (8,)), (2, (8,)), (4, (4, 4)), (1, (8,))]:
        cin = sum(groups)
        w = jnp.asarray(rng.randn(3, 3, cin, 8).astype(np.float32))
        kf = np.asarray(fold_conv_kernel(
            w, s, in_groups=groups if len(groups) > 1 else None))
        from lass_tpu.ops.pallas_folded_conv import _corner_meta
        meta = _corner_meta(s, groups)
        masked = kf.copy()
        masked[:, 1] = 0.0                       # center taps
        for (off, cl), dw in zip(meta, [0, 2] * len(groups)):
            masked[:, dw, off:off + cl] = 0.0    # corner blocks
        assert np.abs(masked).max() == 0.0, (s, groups)


@pytest.mark.parametrize("s,groups,cout,t,g", [
    (4, (4,), 4, 8, 8),      # L1-like single group
    (2, (8,), 8, 8, 8),      # L2-like (fold 2)
    (4, (4, 4), 4, 16, 8),   # decoder concat (two folded groups)
    (1, (8,), 4, 8, 8),      # degenerate fold (dense corners)
])
def test_kernel_matches_dense_oracle(rng, s, groups, cout, t, g):
    x, kf, a, bias = _case(rng, 2, t, g, s, groups, cout)
    want = reference_act_folded_conv(x, kf, a, bias)
    got = fused_act_folded_conv(x, kf, a, bias, s, groups,
                                t_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_kernel_edge_masks(rng):
    """T-edge halo rows and G-edge columns are zero-padded exactly."""
    # single time-tile (both edges in one block) and many tiles
    for t, tile in [(4, 4), (16, 4)]:
        x, kf, a, bias = _case(rng, 1, t, 8, 2, (4,), 4)
        want = reference_act_folded_conv(x, kf, a, bias)
        got = fused_act_folded_conv(x, kf, a, bias, 2, (4,),
                                    t_tile=tile, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)


def test_model_block_equivalence(rng):
    """FoldedConvBlockRes with the sparse kernel enabled == XLA path."""
    import flax.linen as nn

    from lass_tpu.ops import folded as F

    class Wrap(nn.Module):
        use_kernel: bool

        @nn.compact
        def __call__(self, x, beta1, beta2):
            film = {"beta1": beta1, "beta2": beta2}
            return F.FoldedConvBlockRes(
                8, 8, 2, name="blk",
                use_sparse_kernel=self.use_kernel)(x, film, False)

    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    b1 = jnp.asarray(rng.randn(2, 8).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(2, 8).astype(np.float32) * 0.1)
    ref = Wrap(use_kernel=False)
    variables = ref.init(jax.random.PRNGKey(0), x, b1, b2)
    want = ref.apply(variables, x, b1, b2)
    got = Wrap(use_kernel=True).apply(variables, x, b1, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_full_model_equivalence(rng):
    """ResUNet30 with the sparse conv kernel (interpret) == XLA path."""
    import jax.random as jrandom

    from lass_tpu.models.resunet import ResUNet30

    ex = {"mixture": jnp.asarray(
              rng.randn(1, 1, 16000).astype(np.float32) * 0.1),
          "condition": jnp.asarray(rng.randn(1, 512).astype(np.float32))}
    plain = ResUNet30(freq_fold=4, sparse_conv=False)
    variables = plain.init(jrandom.PRNGKey(0), ex, train=False)
    want = plain.apply(variables, ex, train=False)["waveform"]
    got = ResUNet30(freq_fold=4, sparse_conv=True).apply(
        variables, ex, train=False)["waveform"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
