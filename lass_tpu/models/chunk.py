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


def chunk_inference_device(
    apply_fn,
    mixture: jax.Array,
    condition: jax.Array,
    cfg: ChunkConfig = ChunkConfig(),
    max_batch: int = 16,
) -> jax.Array:
    """`chunk_inference` with the window split, per-group forwards, and
    center stitching all inside ONE jit (SURVEY §5.7's lax.map-over-windows
    design): no host round-trips between groups, device-resident output.

    The stitch is a pure reshape: consecutive windows' kept regions
    ([nl, window-nr), plus the first window's left edge and last window's
    right tail) tile [0, padded_len) exactly, because the hop equals
    window - nl - nr. The numpy-stitch `chunk_inference` is the oracle
    (tests/test_chunk.py pins equality). Returns (1, L) on device."""
    nl = int(cfg.NL * cfg.RATE)
    nc = int(cfg.NC * cfg.RATE)
    nr = int(cfg.NR * cfg.RATE)
    window = nl + nc + nr
    length = mixture.shape[-1]

    @jax.jit
    def run(x, cond):
        if length <= window:
            return apply_fn({"mixture": x, "condition": cond})[:, 0, :length]
        n_chunks = int(np.ceil((length - window) / nc)) + 1
        padded_len = (n_chunks - 1) * nc + window
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, padded_len - length)))[0, 0]
        idx = (np.arange(n_chunks)[:, None] * nc
               + np.arange(window)[None, :])
        chunks = xp[jnp.asarray(idx)][:, None, :]  # (n_chunks, 1, window)

        groups = -(-n_chunks // max_batch)
        pad_chunks = groups * max_batch - n_chunks
        chunks = jnp.pad(chunks, ((0, pad_chunks), (0, 0), (0, 0)))
        grouped = chunks.reshape(groups, max_batch, 1, window)
        cond_b = jnp.broadcast_to(cond, (max_batch, cond.shape[-1]))

        def one_group(ch):
            return apply_fn({"mixture": ch, "condition": cond_b})[:, 0]

        if groups == 1:
            sep = one_group(grouped[0])
        else:
            sep = jax.lax.map(one_group, grouped).reshape(-1, window)
        sep = sep[:n_chunks]

        out = jnp.concatenate([
            sep[0, :nl],
            sep[:, nl:window - nr].reshape(-1),
            sep[-1, window - nr:],
        ])
        return out[None, :length]

    return run(mixture, condition)
