"""Tests for the device-side mixer, losses, and LR schedules."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lass_tpu.data.mixer import SegmentMixer
from lass_tpu.losses import get_loss_function, l1
from lass_tpu.train.optim import get_lr_schedule, build_optimizer


class TestSegmentMixer:
    def test_shapes_and_mix_structure(self, rng):
        mixer = SegmentMixer(max_mix_num=2, lower_db=-10, higher_db=10)
        w = jnp.asarray(rng.randn(4, 1, 800).astype(np.float32) * 0.05)
        mixtures, segments = mixer(w, jax.random.PRNGKey(0))
        assert mixtures.shape == w.shape and segments.shape == w.shape
        # no clipping happened for quiet input -> segments == input
        np.testing.assert_allclose(np.asarray(segments), np.asarray(w),
                                   atol=1e-7)
        # mixture - segment must be a scaled roll-by-1 of the input
        noise = np.asarray(mixtures - segments)
        partner = np.asarray(jnp.roll(w, -1, axis=0))
        for n in range(4):
            a, b = noise[n].ravel(), partner[n].ravel()
            corr = abs(np.dot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b))
            assert corr > 0.999

    def test_energy_gain_bounds(self, rng):
        """After both loudnorms, noise energy relative to segment energy must
        lie within the [lower_db, higher_db] gain window (modulo the ratio
        clamp, inactive for same-scale white noise)."""
        mixer = SegmentMixer(2, -10, 10)
        w = jnp.asarray(rng.randn(16, 1, 4000).astype(np.float32) * 0.01)
        mixtures, segments = mixer(w, jax.random.PRNGKey(1))
        noise = np.asarray(mixtures - segments)
        seg = np.asarray(segments)
        snr_db = 10 * np.log10(np.mean(noise**2, axis=(1, 2))
                               / np.mean(seg**2, axis=(1, 2)))
        assert (snr_db > -10.5).all() and (snr_db < 10.5).all()

    def test_declipping(self, rng):
        mixer = SegmentMixer(2, 0, 0)  # 0 dB always
        w = jnp.asarray((rng.rand(2, 1, 100).astype(np.float32) * 2 - 1) * 5)
        mixtures, segments = mixer(w, jax.random.PRNGKey(2))
        m = np.asarray(mixtures)
        assert np.abs(m).max() <= 0.9 + 1e-5
        # segment rescaled by the same factor: ratio mixture/original peak
        peak_per_item = np.abs(m).reshape(2, -1).max(1)
        np.testing.assert_allclose(peak_per_item, 0.9, atol=1e-5)

    def test_max_mix_num_3(self, rng):
        mixer = SegmentMixer(3, -10, 10)
        w = jnp.asarray(rng.randn(6, 1, 500).astype(np.float32) * 0.05)
        mixtures, segments = mixer(w, jax.random.PRNGKey(3))
        assert np.isfinite(np.asarray(mixtures)).all()

    def test_deterministic_given_key(self, rng):
        mixer = SegmentMixer(2, -10, 10)
        w = jnp.asarray(rng.randn(4, 1, 500).astype(np.float32) * 0.05)
        m1, _ = mixer(w, jax.random.PRNGKey(7))
        m2, _ = mixer(w, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_l1_wav_loss(rng):
    loss_fn = get_loss_function("l1_wav")
    a = jnp.asarray(rng.randn(2, 100).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 100).astype(np.float32))
    out = loss_fn({"segment": a}, {"segment": b})
    np.testing.assert_allclose(
        float(out), np.mean(np.abs(np.asarray(a) - np.asarray(b))), rtol=1e-6)
    with pytest.raises(NotImplementedError):
        get_loss_function("nope")


def test_lr_schedules_match_reference_lambdas():
    """Values from reference optimizers/lr_schedulers.py:5-67."""
    lin = get_lr_schedule("linear_warm_up", 1000, 10000)
    assert float(lin(0)) == 0.0
    assert abs(float(lin(500)) - 0.5) < 1e-6
    assert abs(float(lin(1000)) - 1.0) < 1e-6
    assert abs(float(lin(10001)) - 0.9) < 1e-6
    assert abs(float(lin(25000)) - 0.81) < 1e-6

    con = get_lr_schedule("constant_warm_up", 10000, 1000000)
    assert abs(float(con(0)) - 1e-3) < 1e-6
    assert abs(float(con(9999)) - 1e-3) < 1e-6
    assert abs(float(con(10000)) - 1e-2) < 1e-6
    assert abs(float(con(20000)) - 1e-1) < 1e-6
    assert abs(float(con(30000)) - 1.0) < 1e-6


def test_optimizer_matches_torch_adamw_amsgrad(rng):
    """One-param AdamW(amsgrad, wd=0) step-by-step parity vs torch."""
    import torch
    p0 = rng.randn(4, 3).astype(np.float32)
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(5)]

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.AdamW([tp], lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
                             weight_decay=0.0, amsgrad=True)
    for g in grads:
        tp.grad = torch.from_numpy(g.copy())
        topt.step()

    opt = build_optimizer("AdamW", 1e-3, "constant_warm_up", 0, 1)
    # warm_up_steps=0 => lr multiplier 1.0 from step 0
    params = jnp.asarray(p0.copy())
    state = opt.init(params)
    import optax
    for g in grads:
        updates, state = opt.update(jnp.asarray(g.copy()), state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), tp.detach().numpy(),
                               atol=2e-6)


def test_flat_optimizer_bitwise_matches_tree(rng):
    """optax.flatten form (the perf default) is bitwise-identical to the
    per-tensor tree form on a ragged param tree, and its moment buffers
    are flat vectors (what train/loop.py's sharding logic keys on)."""
    import optax
    from lass_tpu.train.optim import TorchAmsgradState

    params = {
        "a": {"kernel": jnp.asarray(rng.randn(7, 5).astype(np.float32)),
              "bias": jnp.asarray(rng.randn(5).astype(np.float32))},
        "b": jnp.asarray(rng.randn(3, 2, 4).astype(np.float32)),
    }
    grads_seq = [
        jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)),
            params)
        for _ in range(4)
    ]
    results = {}
    for flatten in (False, True):
        opt = build_optimizer("AdamW", 1e-3, "linear_warm_up", 10, 1000,
                              flatten=flatten)
        p = params
        state = opt.init(p)
        ams = state[0]
        assert isinstance(ams, TorchAmsgradState)
        assert isinstance(ams.mu, jax.Array) == flatten
        for g in grads_seq:
            updates, state = opt.update(g, state, p)
            p = optax.apply_updates(p, updates)
        results[flatten] = p
    flat_leaves = jax.tree_util.tree_leaves(results[True])
    tree_leaves = jax.tree_util.tree_leaves(results[False])
    for a, b in zip(flat_leaves, tree_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
