"""Retrieval metrics (reference training/train.py:519-591 get_metrics)."""
import numpy as np

from lass_tpu.evaluation.retrieval import retrieval_metrics


def test_perfect_retrieval():
    e = np.eye(4, 8, dtype=np.float64)
    m = retrieval_metrics(e, e)
    assert m["audio_to_text_R@1"] == 1.0
    assert m["text_to_audio_R@1"] == 1.0
    assert m["audio_to_text_mean_rank"] == 1.0
    assert m["audio_to_text_mAP@10"] == 1.0


def test_known_ranks():
    # audio 0 matches text 1 best (true pair ranked 2nd), others perfect
    a = np.eye(3)
    t = np.eye(3)
    a[0] = [0.4, 0.9, 0.0]  # sim to t0=0.4 < sim to t1=0.9 -> rank 1 (0-based)
    m = retrieval_metrics(a, t)
    assert np.isclose(m["audio_to_text_R@1"], 2 / 3)
    assert np.isclose(m["audio_to_text_R@5"], 1.0)
    assert np.isclose(m["audio_to_text_mean_rank"], (2 + 1 + 1) / 3)
    assert np.isclose(m["audio_to_text_mAP@10"], (0.5 + 1 + 1) / 3)


def test_reference_formula_oracle(rng=np.random.RandomState(0)):
    """Cross-check against a direct transcription of the reference math."""
    a = rng.randn(16, 8)
    t = rng.randn(16, 8)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    m = retrieval_metrics(a, t)
    logits = a @ t.T
    ranking = np.argsort(-logits, axis=1)
    preds = np.where(ranking == np.arange(16)[:, None])[1]
    assert m["audio_to_text_mean_rank"] == preds.mean() + 1
    for k in (1, 5, 10):
        assert m[f"audio_to_text_R@{k}"] == np.mean(preds < k)
