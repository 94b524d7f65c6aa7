"""FiLM condition generator as ONE fused matmul.

The reference builds ~40 separate nn.Linear(512, C_i) modules via a pre-order
traversal of the model tree (resunet.py:10-81, get_film_meta :598-618) and
runs them one by one per step. On TPU that is death by a thousand tiny
matmuls; here the whole FiLM generator is a single (B, 512) @ (512, total)
MXU matmul whose output is split back into the reference's nested beta dict.

The spec is an explicit ordered list of (path, features, used) entries that
mirrors get_film_meta's traversal, so converting the reference checkpoint is
a mechanical pack of its per-layer Linear weights into the fused kernel
columns (see lass_tpu/convert/torch_to_jax.py). Entries with used=False
correspond to the reference's dead decoder `beta2` Linears (the decoder
forward never reads them, resunet.py:252-255, but the params exist in its
checkpoints) — we keep the columns for bidirectional checkpoint parity.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

FilmEntry = Tuple[Tuple[str, ...], int, bool]  # (path, features, used)

_ENCODER_CHANNELS = [
    # (name, in_ch, out_ch)
    ("encoder_block1", 32, 32),
    ("encoder_block2", 32, 64),
    ("encoder_block3", 64, 128),
    ("encoder_block4", 128, 256),
    ("encoder_block5", 256, 384),
    ("encoder_block6", 384, 384),
    ("conv_block7a", 384, 384),
]

_DECODER_CHANNELS = [
    ("decoder_block1", 384, 384),
    ("decoder_block2", 384, 384),
    ("decoder_block3", 384, 256),
    ("decoder_block4", 256, 128),
    ("decoder_block5", 128, 64),
    ("decoder_block6", 64, 32),
]


def resunet30_film_spec() -> Tuple[FilmEntry, ...]:
    """FiLM spec for ResUNet30 matching reference get_film_meta ordering."""
    spec = []
    for name, in_ch, out_ch in _ENCODER_CHANNELS:
        spec.append(((name, "conv_block1", "beta1"), in_ch, True))
        spec.append(((name, "conv_block1", "beta2"), out_ch, True))
    for name, in_ch, out_ch in _DECODER_CHANNELS:
        spec.append(((name, "beta1"), in_ch, True))
        spec.append(((name, "beta2"), in_ch, False))  # dead in reference too
        spec.append(((name, "conv_block2", "beta1"), out_ch * 2, True))
        spec.append(((name, "conv_block2", "beta2"), out_ch, True))
    return tuple(spec)


def multistft_film_spec(win_lengths: Sequence[int]) -> Tuple[FilmEntry, ...]:
    """FiLM spec for the multi-resolution variant: per-window encoder_block1
    branches + shared trunk (reference resunet_with_multistft.py:56-118)."""
    spec = []
    for wl in win_lengths:
        spec.append((("encoder_block1s", str(wl), "conv_block1", "beta1"), 32, True))
        spec.append((("encoder_block1s", str(wl), "conv_block1", "beta2"), 32, True))
    fused = 32 * len(win_lengths)
    trunk_enc = [("encoder_block2", fused, 64)] + [
        e for e in _ENCODER_CHANNELS if e[0] not in ("encoder_block1",
                                                     "encoder_block2")
    ]
    for name, in_ch, out_ch in trunk_enc:
        spec.append(((name, "conv_block1", "beta1"), in_ch, True))
        spec.append(((name, "conv_block1", "beta2"), out_ch, True))
    for name, in_ch, out_ch in _DECODER_CHANNELS:
        skip_ch = fused if name == "decoder_block6" else out_ch
        spec.append(((name, "beta1"), in_ch, True))
        spec.append(((name, "beta2"), in_ch, False))
        spec.append(((name, "conv_block2", "beta1"), out_ch + skip_ch, True))
        spec.append(((name, "conv_block2", "beta2"), out_ch, True))
    return tuple(spec)


def _per_slice_xavier(spec: Tuple[FilmEntry, ...], condition_size: int):
    """Initializer matching the reference's per-Linear xavier_uniform
    (base.py:9-15): each column block is initialized with its own fan."""

    def init(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
        del shape
        keys = jax.random.split(key, len(spec))
        xavier = nn.initializers.xavier_uniform()
        cols = [
            xavier(k, (condition_size, feat), dtype)
            for k, (_, feat, _) in zip(keys, spec)
        ]
        return jnp.concatenate(cols, axis=1)

    return init


class FusedFiLM(nn.Module):
    """(B, condition_size) -> nested dict of (B, C_i) betas via one matmul."""

    spec: Tuple[FilmEntry, ...]
    condition_size: int = 512

    @nn.compact
    def __call__(self, condition: jax.Array) -> Dict[str, Any]:
        total = sum(feat for _, feat, _ in self.spec)
        kernel = self.param(
            "kernel", _per_slice_xavier(self.spec, self.condition_size),
            (self.condition_size, total))
        bias = self.param("bias", nn.initializers.zeros, (total,))
        flat = condition @ kernel + bias  # (B, total)

        out: Dict[str, Any] = {}
        offset = 0
        for path, feat, _used in self.spec:
            node = out
            for key in path[:-1]:
                node = node.setdefault(key, {})
            node[path[-1]] = flat[:, offset:offset + feat]
            offset += feat
        return out
