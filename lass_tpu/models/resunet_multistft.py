"""Multi-resolution-STFT ResUNet30 variant.

Behavioral spec: reference models/resunet_with_multistft.py — a parallel
(pre_conv + encoder_block1) branch per STFT window length fused by channel
concat (:53-73, 147-171), shared trunk (:76-125), and reconstruction from
the 512-window mixture phase through a 512-fft ISTFT (:37-50, 192-216).

The reference file does not actually run: it imports a nonexistent
models/film.py (:16), its resunet_blocks are shape-only mocks, bn0 is sized
for 257 bins but applied to every branch (:49-50, 157), and decoder_block6's
skip concat is channel-mismatched (:108-118). This implementation keeps the
declared architecture and makes it compose:

- each branch's magnitude is first adapted onto the 512-window grid
  (T frames x 256 bins) — freq average-pool for finer resolutions,
  nearest-repeat for coarser — so branch outputs/skips concat cleanly;
- per-branch BatchNorm over the branch's own bins pre-adaptation;
- decoder_block6 takes the fused skip via skip_channels;
- FiLM uses the fused single-matmul generator with the multistft spec.

Input follows the precomputed-STFT pipeline format (scripts/
precompute_stfts.py:60-83): dict win_length -> (mag, cos, sin).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lass_tpu.dsp.stft import STFTConfig, istft, magphase
from lass_tpu.models.film import FusedFiLM, multistft_film_spec
from lass_tpu.models.resunet import TIME_DOWNSAMPLE_RATIO, ResUNet30Base
from lass_tpu.nn.blocks import DecoderBlockRes1B, EncoderBlockRes1B
from lass_tpu.nn.layers import BatchNorm, conv2d

RECON_WIN = 512  # reconstruction window (reference :37-40)


def _adapt_freq(x: jax.Array, target_bins: int) -> jax.Array:
    """(B, T, F, C) -> (B, T, target_bins, C): pool finer grids, repeat
    coarser ones. Ratios between the standard windows are exact powers of 2."""
    f = x.shape[2]
    if f == target_bins:
        return x
    if f > target_bins:
        ratio = f // target_bins
        b, t, _, c = x.shape
        return x[:, :, :ratio * target_bins].reshape(
            b, t, target_bins, ratio, c).mean(axis=3)
    ratio = target_bins // f
    return jnp.repeat(x, ratio, axis=2)


class MultiSTFTResUNet30(nn.Module):
    input_channels: int = 1
    output_channels: int = 1
    condition_size: int = 512
    win_lengths: Tuple[int, ...] = (256, 512, 2048)
    hop_size: int = 160
    K: int = 3
    compute_dtype: Any = jnp.float32

    @property
    def recon_cfg(self) -> STFTConfig:
        return STFTConfig(n_fft=RECON_WIN, hop_length=self.hop_size)

    @nn.compact
    def __call__(self, input_dict: Dict[str, Any], target_length: int,
                 train: bool = False) -> Dict[str, jax.Array]:
        """input_dict: {'stft_mixture_mag'|'stft_mixture_cos'|
        'stft_mixture_sin': {win: (B, T, F_win, C)}, 'condition': (B, D)}."""
        mags = input_dict["stft_mixture_mag"]
        coss = input_dict["stft_mixture_cos"]
        sins = input_dict["stft_mixture_sin"]
        condition = input_dict["condition"].astype(jnp.float32)

        film = FusedFiLM(multistft_film_spec(self.win_lengths),
                         self.condition_size, name="film")(condition)

        target_bins = RECON_WIN // 2  # 256
        ref_mag = mags[RECON_WIN]  # (B, T, 257, C)
        origin_t = ref_mag.shape[1]
        pad_t = int(np.ceil(origin_t / TIME_DOWNSAMPLE_RATIO)
                    ) * TIME_DOWNSAMPLE_RATIO - origin_t

        pools, skips = [], []
        for wl in self.win_lengths:
            key = str(wl)
            x = mags[wl]
            x = BatchNorm(x.shape[2], axis=2, name=f"bn0_{key}")(x, train)
            x = x[:, :, :x.shape[2] - 1]  # drop Nyquist bin (F -> 2^k)
            x = _adapt_freq(x, target_bins)
            x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
            x = x.astype(self.compute_dtype)
            x = conv2d(32, (1, 1), name=f"pre_conv_{key}", dtype=x.dtype)(x)
            pool, skip = EncoderBlockRes1B(
                32, 32, (2, 2), name=f"encoder_block1_{key}")(
                x, film["encoder_block1s"][key], train)
            pools.append(pool)
            skips.append(skip)

        fused = 32 * len(self.win_lengths)
        x1p = jnp.concatenate(pools, axis=-1)
        x1 = jnp.concatenate(skips, axis=-1)

        x2p, x2 = EncoderBlockRes1B(fused, 64, (2, 2),
                                    name="encoder_block2")(
            x1p, film["encoder_block2"], train)
        x3p, x3 = EncoderBlockRes1B(64, 128, (2, 2), name="encoder_block3")(
            x2p, film["encoder_block3"], train)
        x4p, x4 = EncoderBlockRes1B(128, 256, (2, 2), name="encoder_block4")(
            x3p, film["encoder_block4"], train)
        x5p, x5 = EncoderBlockRes1B(256, 384, (2, 2), name="encoder_block5")(
            x4p, film["encoder_block5"], train)
        x6p, x6 = EncoderBlockRes1B(384, 384, (1, 2), name="encoder_block6")(
            x5p, film["encoder_block6"], train)
        xc, _ = EncoderBlockRes1B(384, 384, (1, 1), name="conv_block7a")(
            x6p, film["conv_block7a"], train)
        h = DecoderBlockRes1B(384, 384, (1, 2), name="decoder_block1")(
            xc, x6, film["decoder_block1"], train)
        h = DecoderBlockRes1B(384, 384, (2, 2), name="decoder_block2")(
            h, x5, film["decoder_block2"], train)
        h = DecoderBlockRes1B(384, 256, (2, 2), name="decoder_block3")(
            h, x4, film["decoder_block3"], train)
        h = DecoderBlockRes1B(256, 128, (2, 2), name="decoder_block4")(
            h, x3, film["decoder_block4"], train)
        h = DecoderBlockRes1B(128, 64, (2, 2), name="decoder_block5")(
            h, x2, film["decoder_block5"], train)
        h = DecoderBlockRes1B(64, 32, (2, 2), skip_channels=fused,
                              name="decoder_block6")(
            h, x1, film["decoder_block6"], train)
        x = conv2d(self.output_channels * self.K, (1, 1),
                   name="after_conv", dtype=h.dtype)(h)

        # back to the 512-grid: pad freq 256 -> 257, trim time
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
        x = x[:, :origin_t]

        waveform = _reconstruct(
            x.astype(jnp.float32), ref_mag, coss[RECON_WIN],
            sins[RECON_WIN], target_length, self.recon_cfg,
            self.output_channels, self.K)
        return {"waveform": waveform}


def _reconstruct(mask_logits, mag, cos_in, sin_in, length, cfg,
                 output_channels, K):
    from lass_tpu.models.resunet import apply_mask_and_reconstruct

    # precomputed batches store (mag, cos, sin); the fused reconstruction
    # takes the raw complex spectrum
    real_in = mag * cos_in
    imag_in = mag * sin_in
    return apply_mask_and_reconstruct(
        mask_logits, real_in, imag_in, length, cfg, output_channels, K)
