"""Chunked long-audio separation.

Behavioral spec: reference ResUNet30.chunk_inference (resunet.py:655-714):
split a long mixture into overlapping NL+NC+NR windows (defaults 1s+3s+1s
at RATE=32000 — the reference hardcodes 32 kHz here even for the 16 kHz
model; the config is kept but overridable), run the separator per window
with one shared FiLM conditioning, and stitch the central NC regions
(first window also keeps its left edge, last keeps its right tail).

TPU-first difference: the reference loops chunks sequentially at batch=1
with a host round-trip per chunk; here ALL windows run as one batched
forward with static shapes (the tail is zero-padded to a full window and
trimmed after stitching).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ChunkConfig:
    NL: float = 1.0
    NC: float = 3.0
    NR: float = 1.0
    RATE: int = 32000  # reference default (resunet.py:657-662)


def chunk_inference(
    apply_fn,
    mixture: jax.Array,
    condition: jax.Array,
    cfg: ChunkConfig = ChunkConfig(),
    max_batch: int = 16,
) -> np.ndarray:
    """apply_fn: ({'mixture': (B,1,W), 'condition': (B,512)}) -> (B,1,W).
    mixture: (1, 1, L). Returns np (1, L)."""
    nl = int(cfg.NL * cfg.RATE)
    nc = int(cfg.NC * cfg.RATE)
    nr = int(cfg.NR * cfg.RATE)
    window = nl + nc + nr
    length = mixture.shape[-1]

    if length <= window:
        out = apply_fn({"mixture": mixture,
                        "condition": condition})
        return np.asarray(out)[:, 0, :length]

    n_chunks = int(np.ceil((length - window) / nc)) + 1
    padded_len = (n_chunks - 1) * nc + window
    x = jnp.pad(mixture, ((0, 0), (0, 0), (0, padded_len - length)))

    starts = [i * nc for i in range(n_chunks)]
    chunks = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(x, s, window, axis=-1)
         for s in starts], axis=0)  # (n_chunks, 1, window)

    outs = []
    for i in range(0, n_chunks, max_batch):
        part = chunks[i:i + max_batch]
        cond = jnp.broadcast_to(condition, (part.shape[0],
                                            condition.shape[-1]))
        outs.append(np.asarray(
            apply_fn({"mixture": part, "condition": cond})))
    sep = np.concatenate(outs, axis=0)[:, 0]  # (n_chunks, window)

    out = np.zeros(padded_len, np.float32)
    for i, s in enumerate(starts):
        lo = 0 if i == 0 else nl
        hi = window if i == n_chunks - 1 else window - nr
        out[s + lo:s + hi] = sep[i, lo:hi]
    return out[None, :length]
