"""ResUNet30 separator — TPU-native rebuild of reference resunet.py.

Differences from the reference by design (TPU-first):
- NHWC layout (B, T, F, C) so XLA convs hit the MXU without layout transposes.
- The STFT/ISTFT front/back-end are fused windowed-DFT matmul ops
  (lass_tpu.dsp.stft), not conv-layer submodules with frozen DFT weights.
- FiLM is ONE fused 512 -> sum(C_i) matmul (lass_tpu.models.film), not ~40
  small Linears.
- The channel loop of base.py:91-113 is vectorized.
- All shapes static under jit; mixed precision via `compute_dtype`
  (bfloat16 activations, float32 params/masks/DSP).

Numerical spec being matched: reference resunet.py:267-595 (window 1024,
hop 160, center reflect, bn0 over 513 freq bins, time pad to /32, 513->512
freq crop, K=3 mask with sigmoid magnitude + tanh complex phase rotation,
relu output magnitude, ISTFT back to the input length).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lass_tpu.dsp.stft import (
    STFTConfig,
    istft,
    magphase,
    wav_to_spectrogram_complex,
)
from lass_tpu.models.film import FusedFiLM, resunet30_film_spec
from lass_tpu.nn.blocks import DecoderBlockRes1B, EncoderBlockRes1B
from lass_tpu.nn.layers import BatchNorm, conv2d

TIME_DOWNSAMPLE_RATIO = 32  # 2 ** (number of time-downsampling encoder blocks)


class ResUNet30Base(nn.Module):
    """Spectrogram-domain UNet: (B, T, F=512, C_in) -> (B, T, F, C_out * K).

    freq_fold > 1 executes the widest (lowest-channel) level in a
    frequency-folded layout (lass_tpu.ops.folded): mathematically identical
    outputs and an identical parameter tree, but ~4x less HBM traffic at
    the F=512 level where TPU lane padding dominates. freq_fold=1 is the
    plain reference-shaped execution.
    """

    input_channels: int = 1
    output_channels: int = 1
    K: int = 3
    momentum: float = 0.01
    freq_fold: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, film: Dict[str, Any], train: bool
                 ) -> jax.Array:
        if self.freq_fold > 1:
            return self._call_folded(x, film, train)
        x = conv2d(32, (1, 1), name="pre_conv", dtype=x.dtype)(x)
        x1p, x1 = EncoderBlockRes1B(32, 32, (2, 2), name="encoder_block1")(
            x, film["encoder_block1"], train)
        x2p, x2 = EncoderBlockRes1B(32, 64, (2, 2), name="encoder_block2")(
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
        h = DecoderBlockRes1B(64, 32, (2, 2), name="decoder_block6")(
            h, x1, film["decoder_block6"], train)
        return conv2d(self.output_channels * self.K, (1, 1),
                      name="after_conv", dtype=h.dtype)(h)

    def _call_folded(self, x: jax.Array, film: Dict[str, Any], train: bool
                     ) -> jax.Array:
        from lass_tpu.ops.folded import (
            ConvParams, FoldedDecoderBlockRes1B, FoldedEncoderBlockRes1B,
            fold_freq, folded_conv, unfold_freq)

        s = self.freq_fold
        x = fold_freq(x, s)
        w_pre, b_pre = ConvParams((1, 1, self.input_channels, 32),
                                  use_bias=True, name="pre_conv")()
        x = folded_conv(x, w_pre, s, bias=b_pre)
        x1p_f, x1_f = FoldedEncoderBlockRes1B(
            32, 32, s, name="encoder_block1")(
            x, film["encoder_block1"], train)
        # level 2 runs at fold s//2 (the pool's natural output layout)
        x2p_f, x2_f = FoldedEncoderBlockRes1B(
            32, 64, s // 2, name="encoder_block2")(
            x1p_f, film["encoder_block2"], train)
        x2p = x2p_f  # fold s//4 == 1 for s=4: already the plain layout
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
        h = FoldedDecoderBlockRes1B(
            128, 64, 64, fold_in=1, name="decoder_block5")(
            h, x2_f, film["decoder_block5"], train)
        h = FoldedDecoderBlockRes1B(
            64, 32, 32, fold_in=s // 2, input_is_folded=True,
            name="decoder_block6")(
            h, x1_f, film["decoder_block6"], train)
        w_after, b_after = ConvParams(
            (1, 1, 32, self.output_channels * self.K), use_bias=True,
            name="after_conv")()
        out = folded_conv(h, w_after, s, bias=b_after)
        return unfold_freq(out, s)


def apply_mask_and_reconstruct(
    mask_logits: jax.Array,
    real_in: jax.Array,
    imag_in: jax.Array,
    audio_length: int,
    stft_cfg: STFTConfig,
    output_channels: int,
    K: int = 3,
    eps: float = 1e-10,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """K=3 complex-mask apply + phase rotation + ISTFT.

    mask_logits: (B, T, F, C_out*K); real_in/imag_in: the RAW mixture
    spectrum (B, T, F, C_in) — the mixture mag/cos/sin decomposition
    (reference base.py:91-113) happens inside the fused kernel so cos/sin
    never materialize. Returns (B, C_out, L). Reference resunet.py:436-519.
    """
    b, t, f, _ = mask_logits.shape
    x = mask_logits.astype(jnp.float32).reshape(b, t, f, output_channels, K)
    real_in = real_in.astype(jnp.float32)
    imag_in = imag_in.astype(jnp.float32)

    def flat(a):
        return jnp.moveaxis(a, -1, 1).reshape(b * output_channels, t, f)

    backend = jax.default_backend()
    if backend in ("tpu", "axon"):
        from lass_tpu.ops.pallas_masking import apply_complex_mask_ri

        out_real, out_imag = apply_complex_mask_ri(
            flat(x[..., 0]), flat(x[..., 1]), flat(x[..., 2]),
            flat(real_in), flat(imag_in))
    else:
        mag = jnp.sqrt(jnp.maximum(real_in ** 2 + imag_in ** 2, eps))
        cos_in, sin_in = real_in / mag, imag_in / mag
        mask_mag = jax.nn.sigmoid(x[..., 0])
        _, mask_cos, mask_sin = magphase(jnp.tanh(x[..., 1]),
                                         jnp.tanh(x[..., 2]))
        out_cos = cos_in * mask_cos - sin_in * mask_sin
        out_sin = sin_in * mask_cos + cos_in * mask_sin
        out_mag = jax.nn.relu(mag * mask_mag)
        out_real = flat(out_mag * out_cos)
        out_imag = flat(out_mag * out_sin)
    wav = istft(out_real, out_imag, audio_length, stft_cfg,
                precision=precision)
    return wav.reshape(b, output_channels, audio_length)


class ResUNet30(nn.Module):
    """Full separator: waveform in, waveform out, FiLM-conditioned.

    API parity with reference ResUNet30.forward (resunet.py:640-653):
    ``model.apply(vars, {'mixture': (B, C, L), 'condition': (B, 512)})``
    -> ``{'waveform': (B, C, L)}``.
    """

    input_channels: int = 1
    output_channels: int = 1
    condition_size: int = 512
    K: int = 3
    window_size: int = 1024
    hop_size: int = 160
    compute_dtype: Any = jnp.float32
    freq_fold: int = 4  # TPU-first default; 1 = reference-shaped execution
    # f32 DSP matmul passes: HIGHEST = exact f32 (6-pass, parity runs),
    # HIGH = 3-pass (~1e-6 rel — default), DEFAULT = 1-pass bf16
    dsp_precision: Any = jax.lax.Precision.HIGH

    @property
    def stft_cfg(self) -> STFTConfig:
        return STFTConfig(n_fft=self.window_size, hop_length=self.hop_size)

    @nn.compact
    def __call__(self, input_dict: Dict[str, jax.Array], train: bool = False
                 ) -> Dict[str, jax.Array]:
        mixture = input_dict["mixture"]  # (B, C, L)
        condition = input_dict["condition"]  # (B, condition_size)
        audio_length = mixture.shape[-1]

        film = FusedFiLM(resunet30_film_spec(), self.condition_size,
                         name="film")(condition.astype(jnp.float32))

        real_in, imag_in = wav_to_spectrogram_complex(
            mixture, self.stft_cfg, precision=self.dsp_precision)
        mag = jnp.sqrt(jnp.maximum(real_in ** 2 + imag_in ** 2, 1e-10))

        freq_bins = self.stft_cfg.freq_bins
        origin_t = mag.shape[1]
        pad_t = int(np.ceil(origin_t / TIME_DOWNSAMPLE_RATIO)
                    ) * TIME_DOWNSAMPLE_RATIO - origin_t

        # cast before bn0 so the UNet-facing chain stays in compute_dtype
        # (BN statistics are still accumulated in f32 internally)
        x = mag.astype(self.compute_dtype)
        x = BatchNorm(freq_bins, axis=2, name="bn0")(x, train)
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
        x = x[:, :, :freq_bins - 1, :]

        x = ResUNet30Base(self.input_channels, self.output_channels, self.K,
                          freq_fold=self.freq_fold,
                          name="base")(x, film, train)

        # restore original time/freq extent (reference resunet.py:572-574)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
        x = x[:, :origin_t]

        waveform = apply_mask_and_reconstruct(
            x, real_in, imag_in, audio_length, self.stft_cfg,
            self.output_channels, self.K, precision=self.dsp_precision)
        return {"waveform": waveform}
