"""Frequency-folded execution must be mathematically identical to the
reference-shaped execution with the SAME parameters."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lass_tpu.models.resunet import ResUNet30
from lass_tpu.ops.folded import (
    fold_freq, unfold_freq, fold_conv_kernel, folded_conv,
    folded_avg_pool_2x2, folded_convT_2x2)


def test_fold_unfold_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 6, 16, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(unfold_freq(fold_freq(x, 4), 4)), np.asarray(x))


@pytest.mark.parametrize("kw,cin,cout,s", [(3, 8, 8, 4), (3, 8, 16, 2),
                                           (1, 8, 16, 4)])
def test_folded_conv_matches_plain(kw, cin, cout, s, rng):
    x = jnp.asarray(rng.randn(2, 8, 16, cin).astype(np.float32))
    w = jnp.asarray((rng.randn(kw, kw, cin, cout) * 0.1).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = unfold_freq(folded_conv(fold_freq(x, s), w, s), s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_folded_conv_with_groups(rng):
    """Concat of two folded tensors == fold of the channel-concat."""
    s = 4
    a = jnp.asarray(rng.randn(1, 8, 16, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 8, 16, 4).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 8, 4) * 0.1).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        jnp.concatenate([a, b], -1), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    folded_in = jnp.concatenate([fold_freq(a, s), fold_freq(b, s)], -1)
    out = unfold_freq(folded_conv(folded_in, w, s, in_groups=(4, 4)), s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_folded_avg_pool(rng):
    import flax.linen as nn

    x = jnp.asarray(rng.randn(2, 8, 16, 4).astype(np.float32))
    ref = nn.avg_pool(x, (2, 2), (2, 2))
    out = unfold_freq(folded_avg_pool_2x2(fold_freq(x, 4), 4), 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_folded_convT(rng):
    from lass_tpu.nn.layers import conv_transpose2d

    x = jnp.asarray(rng.randn(2, 4, 8, 6).astype(np.float32))
    mod = conv_transpose2d(3, (2, 2), (2, 2))
    variables = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(variables, x)
    w = variables["params"]["kernel"]  # (2, 2, out, in)
    out = unfold_freq(folded_convT_2x2(fold_freq(x, 2), w, 2), 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_resunet_folded_equals_unfolded(rng):
    plain = ResUNet30(freq_fold=1)
    folded = ResUNet30(freq_fold=4)
    x = {
        "mixture": jnp.asarray(rng.randn(1, 1, 16000).astype(np.float32)
                               * 0.1),
        "condition": jnp.asarray(rng.randn(1, 512).astype(np.float32)),
    }
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)
    # identical parameter trees
    v2 = folded.init(jax.random.PRNGKey(0), x, train=False)
    p1 = {jax.tree_util.keystr(p): v.shape for p, v in
          jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    p2 = {jax.tree_util.keystr(p): v.shape for p, v in
          jax.tree_util.tree_flatten_with_path(v2["params"])[0]}
    assert p1 == p2

    out1 = plain.apply(variables, x, train=False)["waveform"]
    out2 = folded.apply(variables, x, train=False)["waveform"]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=2e-5)

    # train mode: identical up to f32 reduction-order noise in the batch
    # statistics (stats reduce over differently-shaped views)
    o1, m1 = plain.apply(variables, x, train=True, mutable=["batch_stats"])
    o2, m2 = folded.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o1["waveform"]),
                               np.asarray(o2["waveform"]), atol=2e-4)
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_flatten_with_path(m1["batch_stats"])[0],
            jax.tree_util.tree_flatten_with_path(m2["batch_stats"])[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=jax.tree_util.keystr(k1))


@pytest.mark.parametrize("s,groups", [(2, None), (4, None), (4, (32, 32)),
                                      (2, (16, 48))])
def test_folded_conv_decomposed_matches_dense(s, groups, rng):
    """Center+corner decomposition (folded_conv_decomposed) is exact vs
    the dense folded kernel for all fold/group shapes the model uses."""
    from lass_tpu.ops.folded import folded_conv, folded_conv_decomposed

    cin = sum(groups) if groups else 32
    cout = 24
    x = jnp.asarray(rng.randn(2, 8, 16, s * cin).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    dense = folded_conv(x, w, s, in_groups=groups)
    dec = folded_conv_decomposed(x, w, s, in_groups=groups)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dense),
                               atol=1e-5)


@pytest.mark.parametrize("s,groups", [(2, None), (4, None), (4, (32, 32)),
                                      (2, (16, 48))])
def test_folded_conv_halo_matches_dense(s, groups, rng):
    """The im2col-halo formulation (folded_conv_halo) is exact vs the
    dense folded kernel for all fold/group shapes the model uses."""
    from lass_tpu.ops.folded import folded_conv, folded_conv_halo

    cin = sum(groups) if groups else 32
    cout = 24
    x = jnp.asarray(rng.randn(2, 8, 16, s * cin).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    dense = folded_conv(x, w, s, in_groups=groups)
    halo = folded_conv_halo(x, w, s, in_groups=groups)
    np.testing.assert_allclose(np.asarray(halo), np.asarray(dense),
                               atol=1e-5)


@pytest.mark.parametrize("s,groups", [(2, None), (4, None), (4, (8, 24)),
                                      (2, (16, 48))])
def test_folded_conv_grouped_1x1_matches_dense(s, groups, rng):
    from lass_tpu.ops.folded import folded_conv, folded_conv_grouped_1x1

    cin = sum(groups) if groups else 32
    cout = 24
    x = jnp.asarray(rng.randn(2, 8, 16, s * cin).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, cin, cout).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    dense = folded_conv(x, w, s, bias=bias, in_groups=groups)
    grp = folded_conv_grouped_1x1(x, w, s, bias=bias, in_groups=groups)
    np.testing.assert_allclose(np.asarray(grp), np.asarray(dense),
                               atol=1e-5)


@pytest.mark.parametrize("s_in", [2, 4])
def test_folded_convT_grouped_matches_dense(s_in, rng):
    from lass_tpu.ops.folded import folded_convT_2x2

    x = jnp.asarray(rng.randn(2, 4, 8, s_in * 16).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 2, 12, 16).astype(np.float32) * 0.1)
    dense = folded_convT_2x2(x, w, s_in, impl="dense")
    grp = folded_convT_2x2(x, w, s_in, impl="grouped")
    np.testing.assert_allclose(np.asarray(grp), np.asarray(dense),
                               atol=1e-5)


def test_resunet_halo_impl_equals_dense(rng, monkeypatch):
    """Full folded model under the halo/grouped flags == default impls."""
    import lass_tpu.ops.folded as F

    x = {"mixture": jnp.asarray(rng.randn(1, 1, 16000).astype(np.float32)),
         "condition": jnp.asarray(rng.randn(1, 512).astype(np.float32))}
    model = ResUNet30(freq_fold=4)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = model.apply(variables, x, train=False)["waveform"]
    monkeypatch.setattr(F, "_CONV_IMPL", "halo")
    monkeypatch.setattr(F, "_CONV_1X1", "grouped")
    monkeypatch.setattr(F, "_CONVT_IMPL", "grouped")
    out = model.apply(variables, x, train=False)["waveform"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("s,groups", [(2, None), (4, None), (4, (32, 32)),
                                      (2, (16, 48))])
def test_folded_conv_phase_pair_matches_dense(s, groups, rng):
    """phase-down -> garbage mask -> phase-up == two dense folded convs
    (the shifted intermediate layout cancels across the pair; masking the
    out-of-range boundary slots restores zero-pad semantics exactly)."""
    from lass_tpu.ops.folded import (folded_conv, folded_conv_phase,
                                     phase_garbage_mask)

    cin = sum(groups) if groups else 32
    cmid, cout = 24, 20
    x = jnp.asarray(rng.randn(2, 8, 16, s * cin).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, cin, cmid).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, cmid, cout).astype(np.float32) * 0.1)
    ref = folded_conv(folded_conv(x, w1, s, in_groups=groups), w2, s)
    h = folded_conv_phase(x, w1, s, up=False, in_groups=groups)
    h = h * jnp.asarray(phase_garbage_mask(s, h.shape[2], h.shape[3]))
    out = folded_conv_phase(h, w2, s, up=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_resunet_phase_impl_equals_dense(rng, monkeypatch):
    """Full folded model under _CONV_IMPL='phase' == dense (eval)."""
    import lass_tpu.ops.folded as F

    x = {"mixture": jnp.asarray(rng.randn(1, 1, 16000).astype(np.float32)),
         "condition": jnp.asarray(rng.randn(1, 512).astype(np.float32))}
    model = ResUNet30(freq_fold=4)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = model.apply(variables, x, train=False)["waveform"]
    monkeypatch.setattr(F, "_CONV_IMPL", "phase")
    out = model.apply(variables, x, train=False)["waveform"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_resunet_phase_impl_equals_dense_train(rng, monkeypatch):
    """Full folded model under _CONV_IMPL='phase' in TRAIN mode == dense:
    forward, updated BatchNorm batch statistics (bn2 sees the
    phase-shifted layout and must exclude the boundary slots via
    stats_mask), and parameter gradients all match."""
    import lass_tpu.ops.folded as F

    x = {"mixture": jnp.asarray(rng.randn(2, 1, 16000).astype(np.float32)),
         "condition": jnp.asarray(rng.randn(2, 512).astype(np.float32))}
    model = ResUNet30(freq_fold=4)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]
    stats = variables["batch_stats"]

    def loss_fn(p):
        out, new_vars = model.apply(
            {"params": p, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"])
        return jnp.mean(jnp.abs(out["waveform"])), new_vars["batch_stats"]

    (ref_loss, ref_stats), ref_grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    monkeypatch.setattr(F, "_CONV_IMPL", "phase")
    (out_loss, out_stats), out_grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)

    np.testing.assert_allclose(float(out_loss), float(ref_loss), atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5),
        out_stats, ref_stats)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4),
        out_grads, ref_grads)


def test_mixed_fold_roundtrip(rng):
    from lass_tpu.ops.folded import mixed_fold_input, mixed_unfold

    x = jnp.asarray(rng.randn(2, 6, 16, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(mixed_unfold(mixed_fold_input(x))), np.asarray(x))


@pytest.mark.parametrize("groups", [None, (8, 24)])
def test_mixed_conv_phase_pair_matches_logical(groups, rng):
    """Mixed 2D phase-down -> garbage mask -> phase-up == two logical 3x3
    convs (SAME padding) on the unfolded tensor."""
    from lass_tpu.ops.folded import (mixed_conv_phase, mixed_fold_input,
                                     mixed_garbage_mask, mixed_unfold)

    cin = sum(groups) if groups else 16
    cmid, cout = 24, 20
    x = jnp.asarray(rng.randn(2, 8, 12, cin).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, cin, cmid).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, cmid, cout).astype(np.float32) * 0.1)

    def conv(a, w):
        return jax.lax.conv_general_dilated(
            a, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ref = conv(conv(x, w1), w2)
    if groups:
        xm = jnp.concatenate(
            [mixed_fold_input(x[..., :groups[0]]),
             mixed_fold_input(x[..., groups[0]:])], axis=-1)
    else:
        xm = mixed_fold_input(x)
    h = mixed_conv_phase(xm, w1, up=False, in_groups=groups)
    h = h * jnp.asarray(mixed_garbage_mask(h.shape[1], h.shape[2],
                                           h.shape[3]))
    out = mixed_unfold(mixed_conv_phase(h, w2, up=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_mixed_pool_convT_after_conv(rng):
    """mixed_avg_pool_to_fold2 == 2x2 avg pool (to fold-2 freq layout);
    mixed_convT_2x2 == kernel==stride (2,2) transposed conv from fold-2
    into the mixed layout; mixed_after_conv_transposed == plain 1x1."""
    import flax.linen as nn
    from lass_tpu.nn.layers import conv_transpose2d
    from lass_tpu.ops.folded import (
        mixed_after_conv_transposed, mixed_avg_pool_to_fold2,
        mixed_convT_2x2, mixed_fold_input, mixed_unfold, unfold_freq)

    x = jnp.asarray(rng.randn(2, 8, 12, 8).astype(np.float32))
    ref_pool = nn.avg_pool(x, (2, 2), (2, 2))
    out_pool = unfold_freq(mixed_avg_pool_to_fold2(mixed_fold_input(x)), 2)
    np.testing.assert_allclose(np.asarray(out_pool), np.asarray(ref_pool),
                               atol=1e-6)

    xt = jnp.asarray(rng.randn(2, 4, 8, 6).astype(np.float32))
    mod = conv_transpose2d(5, (2, 2), (2, 2))
    variables = mod.init(jax.random.PRNGKey(0), xt)
    ref_t = mod.apply(variables, xt)
    w = variables["params"]["kernel"]  # (2, 2, out, in)
    out_t = mixed_unfold(mixed_convT_2x2(fold_freq(xt, 2), w))
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t),
                               atol=1e-5)

    wa = jnp.asarray(rng.randn(1, 1, 8, 3).astype(np.float32) * 0.1)
    ba = jnp.asarray(rng.randn(3).astype(np.float32))
    ref_a = jax.lax.conv_general_dilated(
        x, wa, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + ba
    out_a = mixed_after_conv_transposed(mixed_fold_input(x), wa, ba)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a),
                               atol=1e-5)


def test_resunet_mixed_layout_equals_freq(rng):
    """Full model, L1 mixed layout == freq layout (eval): same params,
    same waveform."""
    x = {"mixture": jnp.asarray(rng.randn(1, 1, 16000).astype(np.float32)),
         "condition": jnp.asarray(rng.randn(1, 512).astype(np.float32))}
    ref_model = ResUNet30(freq_fold=4, l1_layout="freq")
    variables = ref_model.init(jax.random.PRNGKey(0), x, train=False)
    ref = ref_model.apply(variables, x, train=False)["waveform"]
    mixed_model = ResUNet30(freq_fold=4, l1_layout="mixed")
    v2 = mixed_model.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.map(jnp.shape, v2) == jax.tree.map(jnp.shape, variables)
    out = mixed_model.apply(variables, x, train=False)["waveform"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_resunet_mixed_layout_equals_freq_train(rng):
    """L1 mixed layout in TRAIN mode == freq layout: forward, updated
    BatchNorm statistics (bn2 of the L1 blocks sees the 2D phase-shifted
    layout and masks its boundary slots), and parameter gradients."""
    x = {"mixture": jnp.asarray(rng.randn(2, 1, 16000).astype(np.float32)),
         "condition": jnp.asarray(rng.randn(2, 512).astype(np.float32))}
    model_ref = ResUNet30(freq_fold=4, l1_layout="freq")
    model_mix = ResUNet30(freq_fold=4, l1_layout="mixed")
    variables = model_ref.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]
    stats = variables["batch_stats"]

    def loss_fn(model):
        def fn(p):
            out, new_vars = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"])
            return (jnp.mean(jnp.abs(out["waveform"])),
                    new_vars["batch_stats"])
        return fn

    (ref_loss, ref_stats), ref_grads = jax.value_and_grad(
        loss_fn(model_ref), has_aux=True)(params)
    (out_loss, out_stats), out_grads = jax.value_and_grad(
        loss_fn(model_mix), has_aux=True)(params)

    # f32 reduction-order noise: the mixed layout reduces the L1 BN batch
    # statistics over a differently-shaped view than the freq layout
    np.testing.assert_allclose(float(out_loss), float(ref_loss), atol=4e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5),
        out_stats, ref_stats)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4),
        out_grads, ref_grads)
