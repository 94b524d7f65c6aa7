"""Fused act+convT Pallas kernel (ops/pallas_convt) must match the XLA
path (bn affine + FiLM beta + leaky + folded_convT_2x2) exactly."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lass_tpu.nn.layers import leaky_relu
from lass_tpu.ops.folded import (
    ConvParams, FoldedDecoderBlockRes1B, fold_freq, folded_convT_2x2)
from lass_tpu.ops.pallas_convt import fused_act_convT


@pytest.mark.parametrize("s_in,cin,cout,t", [(2, 64, 32, 8), (1, 128, 64, 6)])
def test_fused_act_convT_matches_xla(s_in, cin, cout, t, rng):
    b, g = 2, 16
    cl = s_in * cin
    x = jnp.asarray(rng.randn(b, t, g, cl).astype(np.float32))
    inv = jnp.asarray(rng.randn(cl).astype(np.float32) * 0.5)
    shift = jnp.asarray(rng.randn(cl).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.randn(b, cl).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(2, 2, cout, cin).astype(np.float32) * 0.1)

    z = leaky_relu(x * inv + shift + beta[:, None, None, :])
    ref = folded_convT_2x2(z, w, s_in)

    from lass_tpu.ops.folded import _convT_fold_embedding
    e = jnp.asarray(_convT_fold_embedding(s_in))
    kern = jnp.einsum("rjq,kjoc->krcqo", e, w[::-1])
    w_pair = kern.reshape(2, cl, 2 * s_in * cout)[::-1]
    out = fused_act_convT(x, inv, shift, beta, w_pair, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decoder_block_fused_convT_matches(rng):
    """FoldedDecoderBlockRes1B with the fused kernel forced (interpret)
    == the XLA path, both folded-input (dec6-like) and plain-input
    (dec5-like) configurations."""
    for fold_in, folded_in, cin, cout, skip_c in [(2, True, 64, 32, 32),
                                                  (1, False, 128, 64, 64)]:
        s_out = 2 * fold_in
        b, t, g = 1, 8, 16
        x = jnp.asarray(
            rng.randn(b, t, g, fold_in * cin).astype(np.float32)
            if folded_in else
            rng.randn(b, t, g * fold_in, cin).astype(np.float32))
        skip = jnp.asarray(
            rng.randn(b, 2 * t, g, s_out * skip_c).astype(np.float32))
        film = {
            "beta1": jnp.asarray(rng.randn(b, cin).astype(np.float32) * .1),
            "conv_block2": {
                "beta1": jnp.zeros((b, cout + skip_c), jnp.float32),
                "beta2": jnp.zeros((b, cout), jnp.float32),
            },
        }
        mod_ref = FoldedDecoderBlockRes1B(
            cin, cout, skip_c, fold_in=fold_in, input_is_folded=folded_in,
            use_fused_convT=False)
        mod_fused = FoldedDecoderBlockRes1B(
            cin, cout, skip_c, fold_in=fold_in, input_is_folded=folded_in,
            use_fused_convT=True)
        variables = mod_ref.init(jax.random.PRNGKey(0), x, skip, film,
                                 False)
        ref = mod_ref.apply(variables, x, skip, film, False)
        out = mod_fused.apply(variables, x, skip, film, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5,
                                   err_msg=f"fold_in={fold_in}")
