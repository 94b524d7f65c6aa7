"""Zero-shot classification over CLAP joint embeddings.

Reference: /root/reference/models/CLAP/training/zero_shot.py:13-64
(prompt-templated class embeddings averaged + renormalized; 100 x cosine
logits; top-k accuracy). The reference version targets the CLIP image
branch ("currently not supported for CLAP", :1); this one works over any
embedding callables, so audio zero-shot tagging works out of the box.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def zero_shot_classifier(
    embed_texts: Callable[[Sequence[str]], jnp.ndarray],
    classnames: Sequence[str],
    templates: Sequence[Callable[[str], str]] = (lambda c: f"This is a sound of {c}.",),
) -> jnp.ndarray:
    """(embed_dim, n_classes) prompt-ensemble weights (zero_shot.py:13-27):
    per class, embed every template, L2-normalize, average, renormalize."""
    weights = []
    for classname in classnames:
        texts = [t(classname) for t in templates]
        emb = jnp.asarray(embed_texts(texts))  # (n_templates, D)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        mean = emb.mean(axis=0)
        weights.append(mean / jnp.maximum(jnp.linalg.norm(mean), 1e-12))
    return jnp.stack(weights, axis=1)


def topk_accuracy(logits, target, topk: Tuple[int, ...] = (1, 5)):
    """Counts of correct top-k predictions (zero_shot.py:30-36)."""
    logits = np.asarray(logits)
    target = np.asarray(target)
    kmax = min(max(topk), logits.shape[1])
    pred = np.argsort(-logits, axis=1)[:, :kmax]  # (B, kmax)
    correct = pred == target[:, None]
    return [float(correct[:, :min(k, kmax)].sum()) for k in topk]


def zero_shot_run(
    embed_audio: Callable[..., jnp.ndarray],
    classifier: jnp.ndarray,
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    logit_scale: float = 100.0,
) -> Dict[str, float]:
    """Stream (audio_batch, int_target) pairs -> top-1/top-5 accuracy
    (zero_shot.py:39-64). embed_audio must return normalized embeddings."""
    top1 = top5 = n = 0.0
    for audio, target in batches:
        feats = jnp.asarray(embed_audio(audio))
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        logits = logit_scale * feats @ classifier
        acc1, acc5 = topk_accuracy(logits, target, (1, 5))
        top1 += acc1
        top5 += acc5
        n += feats.shape[0]
    return {"zeroshot-top1": top1 / max(n, 1),
            "zeroshot-top5": top5 / max(n, 1)}
