"""Linear-probe head + LP losses/metrics + zero-shot classification."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lass_tpu.dsp.mel import LogMelConfig
from lass_tpu.evaluation.linear_probe import (
    LPMetrics, get_acc, get_map, get_mauc, lp_loss)
from lass_tpu.evaluation.zero_shot import (
    topk_accuracy, zero_shot_classifier, zero_shot_run)
from lass_tpu.models.clap.htsat import HTSATConfig
from lass_tpu.models.clap.linear_probe import LinearProbe, MLPLayers


@pytest.fixture(scope="module")
def tiny_cfg():
    return HTSATConfig(
        spec_size=128, embed_dim=16, depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2), window_size=4,
        mel=LogMelConfig(sample_rate=16000, n_fft=256, hop_length=160,
                         n_mels=32))


def test_linear_probe_forward_and_freeze(tiny_cfg, rng):
    probe = LinearProbe(out_ch=10, mlp=False, freeze=True,
                        audio_cfg=tiny_cfg)
    wave = jnp.asarray(rng.randn(2, 16000).astype(np.float32) * 0.1)
    variables = probe.init(jax.random.PRNGKey(0), wave, train=False)
    out = probe.apply(variables, wave, train=False)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()

    # freeze=True: gradient reaches lp_layer but NOT the CLAP trunk
    # (reference linear_probe.py:28-30)
    target = jax.nn.one_hot(jnp.array([1, 2]), 10)

    def loss_fn(params):
        pred = probe.apply({**variables, "params": params}, wave, train=True,
                           rngs={"dropout": jax.random.PRNGKey(1)})
        return lp_loss("ce")(pred, target)

    grads = jax.grad(loss_fn)(variables["params"])
    lp_norm = jnp.linalg.norm(grads["lp_layer"]["kernel"])
    trunk_leaves = jax.tree_util.tree_leaves(grads["clap_model"])
    trunk_norm = sum(jnp.sum(jnp.abs(g)) for g in trunk_leaves)
    assert float(lp_norm) > 0
    assert float(trunk_norm) == 0.0


def test_linear_probe_mlp_and_act(tiny_cfg, rng):
    probe = LinearProbe(out_ch=7, mlp=True, freeze=True, act="sigmoid",
                        audio_cfg=tiny_cfg)
    wave = jnp.asarray(rng.randn(1, 16000).astype(np.float32) * 0.1)
    variables = probe.init(jax.random.PRNGKey(0), wave, train=False)
    out = np.asarray(probe.apply(variables, wave, train=False))
    assert out.shape == (1, 7)
    assert (out >= 0).all() and (out <= 1).all()
    # MLP head layout: 512 -> 1024 -> 7 (reference linear_probe.py:24)
    assert variables["params"]["lp_layer"]["linear0"]["kernel"].shape == \
        (512, 1024)
    assert variables["params"]["lp_layer"]["linear1"]["kernel"].shape == \
        (1024, 7)


def test_mlp_layers_matches_torch(rng):
    torch = pytest.importorskip("torch")
    torch_nn = torch.nn

    units = [8, 16, 4]
    seq = []
    for u0, u1 in zip(units[:-1], units[1:]):
        seq += [torch_nn.Linear(u0, u1), torch_nn.ReLU(),
                torch_nn.Dropout(0.1)]
    ref = torch_nn.Sequential(*seq[:-2]).eval()

    x = rng.randn(3, 8).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    params = {}
    idx = 0
    for i, m in enumerate(ref):
        if isinstance(m, torch_nn.Linear):
            params[f"linear{idx}"] = {
                "kernel": jnp.asarray(m.weight.detach().numpy().T),
                "bias": jnp.asarray(m.bias.detach().numpy())}
            idx += 1
    out = MLPLayers(tuple(units)).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_lp_losses_match_torch(rng):
    torch = pytest.importorskip("torch")

    pred = rng.randn(6, 5).astype(np.float32)
    target = np.eye(5, dtype=np.float32)[rng.randint(0, 5, size=6)]
    tp, tt = torch.from_numpy(pred), torch.from_numpy(target)

    want_bce = torch.nn.BCEWithLogitsLoss()(tp, tt).item()
    want_ce = torch.nn.CrossEntropyLoss()(tp, tt.argmax(1)).item()
    want_mse = torch.nn.MSELoss()(tp, tt).item()

    assert np.isclose(float(lp_loss("bce")(pred, target)), want_bce,
                      atol=1e-6)
    assert np.isclose(float(lp_loss("ce")(pred, target)), want_ce, atol=1e-6)
    assert np.isclose(float(lp_loss("mse")(pred, target)), want_mse,
                      atol=1e-6)
    with pytest.raises(ValueError):
        lp_loss("huber")


def test_lp_metrics_match_sklearn(rng):
    sklearn_metrics = pytest.importorskip("sklearn.metrics")

    pred = rng.randn(64, 6).astype(np.float64)
    target = (rng.rand(64, 6) > 0.6).astype(np.float64)
    target[:, 0] = rng.rand(64) > 0.5  # ensure both classes present
    target[0] = 1.0
    target[1] = 0.0
    prob = 1 / (1 + np.exp(-pred))

    want_map = np.mean(sklearn_metrics.average_precision_score(
        target, prob, average=None))
    want_auc = np.mean(sklearn_metrics.roc_auc_score(
        target, prob, average=None))
    assert np.isclose(get_map(pred, target), want_map, atol=1e-10)
    assert np.isclose(get_mauc(pred, target), want_auc, atol=1e-10)

    onehot = np.eye(6)[rng.randint(0, 6, size=64)]
    want_acc = np.mean(pred.argmax(1) == onehot.argmax(1))
    assert np.isclose(get_acc(pred, onehot), want_acc)

    m = LPMetrics(["map", "acc"])
    out = m.evaluate_metrics(pred, onehot)
    assert set(out) == {"map", "acc"}
    with pytest.raises(ValueError):
        LPMetrics(["f1"])


def test_zero_shot_pipeline(rng):
    # synthetic joint space: class c's text embedding == basis vector e_c;
    # audio embeddings are noisy basis vectors -> top-1 must be perfect at
    # low noise and the classifier columns unit-norm
    dim, n_class = 16, 4
    basis = np.eye(dim, dtype=np.float32)

    def embed_texts(texts):
        # "This is a sound of class3." -> e_3 (two templates, one noisier)
        idx = [int(t.rstrip(".!").split("class")[-1]) for t in texts]
        noise = np.array([0.0 if "!" not in t else 0.05 for t in texts])
        return jnp.asarray(
            basis[idx] + noise[:, None] * rng.randn(len(idx), dim) * 0.01)

    classifier = zero_shot_classifier(
        embed_texts, [f"class{i}" for i in range(n_class)],
        templates=(lambda c: f"This is a sound of {c}.",
                   lambda c: f"{c}!"))
    assert classifier.shape == (dim, n_class)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(classifier), axis=0), 1.0, atol=1e-5)

    targets = rng.randint(0, n_class, size=8)
    audio = basis[targets] + 0.01 * rng.randn(8, dim).astype(np.float32)
    res = zero_shot_run(lambda a: jnp.asarray(a), classifier,
                        [(audio[:4], targets[:4]), (audio[4:], targets[4:])])
    assert res["zeroshot-top1"] == 1.0
    assert res["zeroshot-top5"] == 1.0

    # topk_accuracy against a hand case
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    acc1, acc2 = topk_accuracy(logits, np.array([1, 2]), (1, 2))
    assert acc1 == 1.0 and acc2 == 1.0
