"""Int8 quantized eval path (ops/quant.py): mechanics + model-level flow.

Three layers of guarantees:
  1. conv_int8 == float conv within the analytic quantization error bound.
  2. The folded-model int8 kernel CONSTRUCTION is exact: with the int8
     rounding disabled (monkeypatched to a float conv), the quantized
     apply must equal the float apply bit-for-bit-ish (same kernels).
  3. The calibrate -> quantized-apply flow works end to end and the
     param tree is untouched (torch-checkpoint conversion oblivious).

On-hardware quality is guarded separately by bench.py's parity gate.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lass_tpu.ops import quant as Q


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray((rng.randn(3, 3, 16, 8) * 0.3).astype(np.float32))
    kq, sw = Q.quantize_weight(w)
    assert kq.dtype == jnp.int8
    back = np.asarray(kq, np.float32) * np.asarray(sw)
    # per-output-lane max tap is exact; everything within half a step
    np.testing.assert_allclose(back, np.asarray(w),
                               atol=float(np.max(sw)) * 0.5 + 1e-7)


def test_conv_int8_close_to_float(rng):
    x = jnp.asarray(rng.randn(2, 16, 24, 32).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 32, 16) * 0.1).astype(np.float32))
    scale = jnp.max(jnp.abs(x), axis=(0, 1, 2)) / 127.0
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = Q.conv_int8(x, w, scale * 127.0 / 127.0, padding="SAME")
    rel = (np.linalg.norm(np.asarray(out) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert rel < 0.02, rel


@pytest.mark.parametrize("kh,kw,pad", [
    (3, 2, ((1, 1), (1, 1))), (3, 3, "SAME"), (1, 1, "SAME"),
    (3, 2, ((1, 1), (0, 0)))])
def test_conv_int8_dot_impl_exact(rng, monkeypatch, kh, kw, pad):
    """LASS_TPU_QUANT_IMPL=dot (shifted int8 matmuls) must equal the int8
    conv bit-for-bit — same quantization, same int32 accumulation."""
    x = jnp.asarray(rng.randn(2, 8, 12, 16).astype(np.float32))
    w = jnp.asarray((rng.randn(kh, kw, 16, 8) * 0.2).astype(np.float32))
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=(0, 1, 2)), 1e-12) / 127.0
    ref = Q.conv_int8(x, w, scale, padding=pad)
    monkeypatch.setattr(Q, "_IMPL", "dot")
    out = Q.conv_int8(x, w, scale, padding=pad)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_conv_int8_lhs_dilation(rng):
    """The convT-as-dilated-conv path used by the folded decoder."""
    x = jnp.asarray(rng.randn(1, 8, 16, 8).astype(np.float32))
    w = jnp.asarray((rng.randn(2, 1, 8, 16) * 0.2).astype(np.float32))
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=(0, 1, 2)), 1e-12) / 127.0
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (0, 0)), lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = Q.conv_int8(x, w, scale * 127.0 / 127.0,
                      padding=((1, 1), (0, 0)), lhs_dilation=(2, 1))
    rel = (np.linalg.norm(np.asarray(out) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref) + 1e-30))
    assert rel < 0.03, rel


def _tiny_model_and_inputs(rng, quantize, freq_fold=4):
    from lass_tpu.models.resunet import ResUNet30

    model = ResUNet30(freq_fold=freq_fold, quantize=quantize)
    batch = {
        "mixture": jnp.asarray(
            (rng.randn(1, 1, 32000) * 0.1).astype(np.float32)),
        "condition": jnp.asarray(rng.randn(1, 512).astype(np.float32)),
    }
    return model, batch


@pytest.mark.parametrize("freq_fold", [1, 4])
def test_model_quant_kernel_construction_exact(rng, monkeypatch, freq_fold):
    """With rounding disabled, the quantized path's folded kernels must
    reproduce the float path exactly -> the einsum/reshape kernel
    construction (phase pair, convT embedding, shortcut fold, and the
    plain bottleneck blocks' nn.Conv replica) is right."""
    def conv_float(x, kern, x_scale, *, padding, bias=None,
                   lhs_dilation=None, out_dtype=None, packed=None):
        if callable(kern):  # deferred fold/phase einsum (ops/quant.py)
            kern = kern()
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kern.astype(jnp.float32), (1, 1),
            padding, lhs_dilation=lhs_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(out_dtype or x.dtype)

    model_f, batch = _tiny_model_and_inputs(rng, quantize=False,
                                            freq_fold=freq_fold)
    model_q, _ = _tiny_model_and_inputs(rng, quantize=True,
                                        freq_fold=freq_fold)
    variables = model_f.init(jax.random.PRNGKey(0), batch, train=False)
    ref = model_f.apply(variables, batch, train=False)["waveform"]

    # calibration pass (records amax; float math)
    _, quant_vars = model_q.apply(
        {**variables}, batch, train=False, mutable=["quant"])
    monkeypatch.setattr(Q, "conv_int8", conv_float)
    out = model_q.apply({**variables, **quant_vars}, batch,
                        train=False)["waveform"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-4)


def test_model_qpack_matches_in_graph(rng, monkeypatch):
    """Offline weight pre-quantization (ops/quant.py:qconv), bias
    correction disabled: the pack pass and the packed apply must BOTH
    equal the in-graph quantized apply exactly — packing only hoists
    quantize_weight out of the forward (same f32 quantize math, same
    int8 kernels, same int32 accumulation)."""
    monkeypatch.setenv("LASS_TPU_QUANT_BC", "0")
    model_f, batch = _tiny_model_and_inputs(rng, quantize=False)
    model_q, _ = _tiny_model_and_inputs(rng, quantize=True)
    variables = model_f.init(jax.random.PRNGKey(0), batch, train=False)

    _, quant_vars = model_q.apply(
        {**variables}, batch, train=False, mutable=["quant"])
    merged = {**variables, **quant_vars}
    ref = np.asarray(model_q.apply(merged, batch,
                                   train=False)["waveform"])

    out_pack, qpack = model_q.apply(merged, batch, train=False,
                                    mutable=["qpack"])
    assert len(jax.tree_util.tree_leaves(qpack)) > 0
    kq_leaves = [v for v in jax.tree_util.tree_leaves(qpack)
                 if v.dtype == jnp.int8]
    assert kq_leaves, "pack recorded no int8 kernels"
    np.testing.assert_array_equal(
        np.asarray(out_pack["waveform"]), ref)

    out = np.asarray(model_q.apply({**merged, **qpack}, batch,
                                   train=False)["waveform"])
    np.testing.assert_array_equal(out, ref)
    # params untouched: checkpoints/converters oblivious to the pack
    assert set(merged["params"].keys()) == set(variables["params"].keys())


def test_model_qpack_bias_correction_tightens(rng):
    """With bias correction ON (default), the packed apply must be
    STRICTLY closer to the float forward than plain in-graph int8 on the
    pack batch — bc absorbs the accumulated per-lane DC quantization
    error layer by layer (ops/quant.py:qconv)."""
    model_f, batch = _tiny_model_and_inputs(rng, quantize=False)
    model_q, _ = _tiny_model_and_inputs(rng, quantize=True)
    variables = model_f.init(jax.random.PRNGKey(0), batch, train=False)
    ref = np.asarray(model_f.apply(variables, batch,
                                   train=False)["waveform"])

    _, quant_vars = model_q.apply(
        {**variables}, batch, train=False, mutable=["quant"])
    merged = {**variables, **quant_vars}
    plain = np.asarray(model_q.apply(merged, batch,
                                     train=False)["waveform"])
    _, qpack = model_q.apply(merged, batch, train=False,
                             mutable=["qpack"])
    packed = np.asarray(model_q.apply({**merged, **qpack}, batch,
                                      train=False)["waveform"])

    err_plain = np.linalg.norm(plain - ref) / np.linalg.norm(ref)
    err_packed = np.linalg.norm(packed - ref) / np.linalg.norm(ref)
    assert err_packed < err_plain, (err_packed, err_plain)


def test_model_quant_calibrate_then_apply(rng):
    """End-to-end: calibrate -> int8 apply stays close to float on the
    calibration input; params untouched; calibration output == float."""
    model_f, batch = _tiny_model_and_inputs(rng, quantize=False)
    model_q, _ = _tiny_model_and_inputs(rng, quantize=True)
    variables = model_f.init(jax.random.PRNGKey(0), batch, train=False)
    ref = np.asarray(
        model_f.apply(variables, batch, train=False)["waveform"])

    calib_out, quant_vars = model_q.apply(
        {**variables}, batch, train=False, mutable=["quant"])
    # calibration runs the FLOAT path
    np.testing.assert_allclose(np.asarray(calib_out["waveform"]), ref,
                               atol=1e-5)
    assert "quant" in quant_vars and len(
        jax.tree_util.tree_leaves(quant_vars)) > 0

    out = np.asarray(model_q.apply(
        {**variables, **quant_vars}, batch, train=False)["waveform"])
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-30)
    assert rel < 0.15, rel
