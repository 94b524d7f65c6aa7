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

import os
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

# Training rematerialization of the residual blocks (LASS_TPU_REMAT /
# ResUNet30.remat): 'none' saves every intermediate (XLA spills the big
# wide-level activations to HBM and the bwd pays the copy traffic back),
# 'wide' remats only the folded wide levels (encoder_block1/2 +
# decoder_block5/6 — the [B,1024,*,128]-class tensors the xplane rollup
# attributes ~41 ms/step of bwd copies to), 'all' remats every block.
# Remat is a no-op wrapper at eval (no grads) and keeps the param tree
# byte-identical (flax lifted transform).
_REMAT = os.environ.get("LASS_TPU_REMAT", "none")


def _maybe_remat(cls, static_argnums, enabled: bool):
    return nn.remat(cls, static_argnums=static_argnums) if enabled else cls


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
    # L1 (widest level) layout: None = env LASS_TPU_L1_LAYOUT; 'freq' =
    # fold-4 frequency; 'mixed' = 2x2 time-x-frequency fold (the 2D phase
    # pair runs (2, 2) kernels at 16/9 of the logical FLOPs vs 8/3 for the
    # freq-fold phase pair). Identical param tree and exact numerics
    # either way (tests/test_folded.py).
    l1_layout: Optional[str] = None
    # block-sparse fused act+conv eval kernel for the folded levels
    # (ops/pallas_folded_conv): None = auto (TPU backends), True/False force
    sparse_conv: Any = None
    # int8 MXU execution of the folded conv blocks (eval-only, needs a
    # calibrated 'quant' collection — ops/quant.py): None = LASS_TPU_QUANT
    quantize: Optional[bool] = None
    # fused_head: skip the folded after_conv and return
    # (h_folded, w_after, b_after) so the caller can run the fused
    # after_conv + mask Pallas kernel (ops/pallas_masking.py). The after_conv
    # params are created either way — the parameter tree is identical.
    fused_head: bool = False
    # training remat of the residual blocks: 'none'/'wide'/'all'
    # (None = env LASS_TPU_REMAT; see _REMAT above)
    remat: Optional[str] = None

    def _remat_flags(self) -> Tuple[bool, bool]:
        mode = self.remat if self.remat is not None else _REMAT
        if mode not in ("none", "wide", "all"):
            raise ValueError(f"remat must be none/wide/all, got {mode!r}")
        return mode in ("wide", "all"), mode == "all"

    @nn.compact
    def __call__(self, x: jax.Array, film: Dict[str, Any], train: bool
                 ) -> jax.Array:
        if self.freq_fold > 1:
            return self._call_folded(x, film, train)
        wide_r, all_r = self._remat_flags()
        EncW = _maybe_remat(EncoderBlockRes1B, (3,), wide_r)
        Enc = _maybe_remat(EncoderBlockRes1B, (3,), all_r)
        DecW = _maybe_remat(DecoderBlockRes1B, (4,), wide_r)
        Dec = _maybe_remat(DecoderBlockRes1B, (4,), all_r)
        x = conv2d(32, (1, 1), name="pre_conv", dtype=x.dtype)(x)
        q = self.quantize
        x1p, x1 = EncW(32, 32, (2, 2), quantize=q,
                       name="encoder_block1")(
            x, film["encoder_block1"], train)
        x2p, x2 = EncW(32, 64, (2, 2), quantize=q,
                       name="encoder_block2")(
            x1p, film["encoder_block2"], train)
        x3p, x3 = Enc(64, 128, (2, 2), quantize=q,
                      name="encoder_block3")(
            x2p, film["encoder_block3"], train)
        x4p, x4 = Enc(128, 256, (2, 2), quantize=q,
                      name="encoder_block4")(
            x3p, film["encoder_block4"], train)
        x5p, x5 = Enc(256, 384, (2, 2), quantize=q,
                      name="encoder_block5")(
            x4p, film["encoder_block5"], train)
        x6p, x6 = Enc(384, 384, (1, 2), quantize=q,
                      name="encoder_block6")(
            x5p, film["encoder_block6"], train)
        xc, _ = Enc(384, 384, (1, 1), quantize=q,
                    name="conv_block7a")(
            x6p, film["conv_block7a"], train)
        h = Dec(384, 384, (1, 2), quantize=q,
                name="decoder_block1")(
            xc, x6, film["decoder_block1"], train)
        h = Dec(384, 384, (2, 2), quantize=q,
                name="decoder_block2")(
            h, x5, film["decoder_block2"], train)
        h = Dec(384, 256, (2, 2), quantize=q,
                name="decoder_block3")(
            h, x4, film["decoder_block3"], train)
        h = Dec(256, 128, (2, 2), quantize=q,
                name="decoder_block4")(
            h, x3, film["decoder_block4"], train)
        h = DecW(128, 64, (2, 2), quantize=q,
                 name="decoder_block5")(
            h, x2, film["decoder_block5"], train)
        h = DecW(64, 32, (2, 2), quantize=q,
                 name="decoder_block6")(
            h, x1, film["decoder_block6"], train)
        return conv2d(self.output_channels * self.K, (1, 1),
                      name="after_conv", dtype=h.dtype)(h)

    def _call_folded(self, x: jax.Array, film: Dict[str, Any], train: bool
                     ) -> jax.Array:
        import lass_tpu.ops.folded as F
        from lass_tpu.ops.folded import (
            ConvParams, FoldedDecoderBlockRes1B, FoldedEncoderBlockRes1B,
            MixedDecoderBlockRes1B, MixedEncoderBlockRes1B,
            fold_freq, folded_conv, mixed_fold_input, unfold_freq)

        s = self.freq_fold
        layout = self.l1_layout or F._L1_LAYOUT
        mixed = layout == "mixed" and s == 4
        wide_r, all_r = self._remat_flags()
        FEncW = _maybe_remat(FoldedEncoderBlockRes1B, (3,), wide_r)
        MEncW = _maybe_remat(MixedEncoderBlockRes1B, (3,), wide_r)
        Enc = _maybe_remat(EncoderBlockRes1B, (3,), all_r)
        Dec = _maybe_remat(DecoderBlockRes1B, (4,), all_r)
        FDecW = _maybe_remat(FoldedDecoderBlockRes1B, (4,), wide_r)
        MDecW = _maybe_remat(MixedDecoderBlockRes1B, (4,), wide_r)
        x = mixed_fold_input(x) if mixed else fold_freq(x, s)
        w_pre, b_pre = ConvParams((1, 1, self.input_channels, 32),
                                  use_bias=True, name="pre_conv")()
        x = folded_conv(x, w_pre, s, bias=b_pre)
        if mixed:
            x1p_f, x1_f = MEncW(
                32, 32, name="encoder_block1")(
                x, film["encoder_block1"], train)
        else:
            x1p_f, x1_f = FEncW(
                32, 32, s, use_sparse_kernel=self.sparse_conv,
                quantize=self.quantize,
                name="encoder_block1")(
                x, film["encoder_block1"], train)
        # level 2 runs at fold s//2 (the pool's natural output layout)
        x2p_f, x2_f = FEncW(
            32, 64, s // 2, use_sparse_kernel=self.sparse_conv,
            quantize=self.quantize,
            name="encoder_block2")(
            x1p_f, film["encoder_block2"], train)
        x2p = x2p_f  # fold s//4 == 1 for s=4: already the plain layout
        q = self.quantize
        x3p, x3 = Enc(64, 128, (2, 2), quantize=q,
                      name="encoder_block3")(
            x2p, film["encoder_block3"], train)
        x4p, x4 = Enc(128, 256, (2, 2), quantize=q,
                      name="encoder_block4")(
            x3p, film["encoder_block4"], train)
        x5p, x5 = Enc(256, 384, (2, 2), quantize=q,
                      name="encoder_block5")(
            x4p, film["encoder_block5"], train)
        x6p, x6 = Enc(384, 384, (1, 2), quantize=q,
                      name="encoder_block6")(
            x5p, film["encoder_block6"], train)
        xc, _ = Enc(384, 384, (1, 1), quantize=q,
                    name="conv_block7a")(
            x6p, film["conv_block7a"], train)
        h = Dec(384, 384, (1, 2), quantize=q,
                name="decoder_block1")(
            xc, x6, film["decoder_block1"], train)
        h = Dec(384, 384, (2, 2), quantize=q,
                name="decoder_block2")(
            h, x5, film["decoder_block2"], train)
        h = Dec(384, 256, (2, 2), quantize=q,
                name="decoder_block3")(
            h, x4, film["decoder_block3"], train)
        h = Dec(256, 128, (2, 2), quantize=q,
                name="decoder_block4")(
            h, x3, film["decoder_block4"], train)
        h = FDecW(
            128, 64, 64, fold_in=1, use_sparse_kernel=self.sparse_conv,
            quantize=self.quantize,
            name="decoder_block5")(
            h, x2_f, film["decoder_block5"], train)
        if mixed:
            h = MDecW(
                64, 32, 32, name="decoder_block6")(
                h, x1_f, film["decoder_block6"], train)
        else:
            h = FDecW(
                64, 32, 32, fold_in=s // 2, input_is_folded=True,
                use_sparse_kernel=self.sparse_conv,
                quantize=self.quantize,
                name="decoder_block6")(
                h, x1_f, film["decoder_block6"], train)
        w_after, b_after = ConvParams(
            (1, 1, 32, self.output_channels * self.K), use_bias=True,
            name="after_conv")()
        if self.fused_head:
            return h, w_after, b_after
        if mixed:
            from lass_tpu.ops.folded import mixed_after_conv_transposed
            return mixed_after_conv_transposed(h, w_after, b_after)
        from lass_tpu.ops.folded import folded_after_conv_transposed
        return folded_after_conv_transposed(h, w_after, b_after, s)


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

    mask_logits: (B, T, F, C_out*K) or (B, T, F-1, C_out*K); real_in/
    imag_in: the RAW mixture spectrum (B, T, F, C_in) — the mixture
    mag/cos/sin decomposition (reference base.py:91-113) happens inside the
    fused kernel so cos/sin never materialize. When the logits omit the
    Nyquist bin (F-1 = the UNet's 512-bin output), its mask output is
    treated as exactly zero — which is exact, since zero logits produce a
    zero phase-rotation factor — and the ISTFT runs with the
    truncated-Nyquist basis, keeping lanes a power of two (no 513-pad).
    Returns (B, C_out, L). Reference resunet.py:436-519.
    """
    b, t, f, _ = mask_logits.shape
    truncated = f == stft_cfg.freq_bins - 1
    if truncated:
        real_in = real_in[..., :f, :]
        imag_in = imag_in[..., :f, :]
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
                precision=precision, truncated_nyquist=truncated)
    return wav.reshape(b, output_channels, audio_length)


def apply_fused_head_and_reconstruct(
    h: jax.Array,
    w_after: jax.Array,
    b_after: jax.Array,
    real_in: jax.Array,
    imag_in: jax.Array,
    origin_t: int,
    audio_length: int,
    stft_cfg: STFTConfig,
    s: int,
    output_channels: int,
    K: int = 3,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
) -> jax.Array:
    """Fused after_conv + mask + truncated-Nyquist ISTFT (folded layout).

    h: decoder output, folded (B, T_pad, G, s*32); w_after/b_after: the
    LOGICAL after_conv params (1, 1, 32, out*K) / (out*K,); real_in/imag_in:
    raw mixture spectrum (B, T0, F, 1). Numerics match
    apply_mask_and_reconstruct exactly: the padded Nyquist bin's mask output
    is identically zero (mask_cos = mask_sin = 0 for zero logits), so
    dropping it from the synthesis matmul is not an approximation.
    """
    from lass_tpu.ops.folded import fold_conv_kernel
    from lass_tpu.ops.pallas_masking import apply_head_mask_folded

    b, t_pad, g, _ = h.shape
    fb = stft_cfg.freq_bins
    w2d = fold_conv_kernel(w_after, s)[0, 0]  # (s*32, s*out*K)
    bias = jnp.tile(b_after, s)

    def foldspec(a):
        a = a[..., 0][..., :fb - 1].reshape(b, origin_t, g, s)
        a = jnp.pad(a, ((0, 0), (0, t_pad - origin_t), (0, 0), (0, 0)))
        if output_channels > 1:
            a = jnp.repeat(a, output_channels, axis=-1)
        return a

    # folded after_conv column k*K+kk -> (fold r, out o) = lane r*out + o
    out_real, out_imag = apply_head_mask_folded(
        h, w2d[:, 0::K], w2d[:, 1::K], w2d[:, 2::K],
        bias[0::K], bias[1::K], bias[2::K],
        foldspec(real_in), foldspec(imag_in), interpret)

    def unfold_out(a):
        a = a[:, :origin_t]
        if output_channels == 1:
            return a.reshape(b, origin_t, g * s)
        a = a.reshape(b, origin_t, g, s, output_channels)
        a = jnp.moveaxis(a, -1, 1)
        return a.reshape(b * output_channels, origin_t, g * s)

    wav = istft(unfold_out(out_real), unfold_out(out_imag), audio_length,
                stft_cfg, precision=precision, truncated_nyquist=True)
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
    # L1 layout: None = env LASS_TPU_L1_LAYOUT ('freq'/'mixed'), see
    # ResUNet30Base.l1_layout
    l1_layout: Optional[str] = None
    # f32 DSP matmul passes: HIGHEST = exact f32 (6-pass, parity runs),
    # HIGH = 3-pass (~1e-6 rel — default), DEFAULT = 1-pass bf16
    dsp_precision: Any = jax.lax.Precision.HIGH
    # block-sparse fused act+conv eval kernel for the folded levels
    sparse_conv: Any = None
    # int8 MXU execution of the folded conv blocks (eval-only; calibrate
    # with apply(..., mutable=['quant']) once — see ops/quant.py)
    quantize: Optional[bool] = None
    # fused after_conv+mask Pallas head (folded path): measured SLOWER than
    # the XLA path on v5e — its (B,T,G,M=4)-minor output lane-pads 4->128
    # (32x physical HBM blow-up) and the big-tile variant overflows scoped
    # VMEM. Kept as opt-in infrastructure (tests force True, interpret).
    fuse_head: Any = None
    # training remat: 'none'/'wide'/'all' (None = env LASS_TPU_REMAT)
    remat: Optional[str] = None

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

        backend = jax.default_backend()
        import lass_tpu.ops.folded as _F
        mixed = (self.l1_layout or _F._L1_LAYOUT) == "mixed" \
            and self.freq_fold == 4
        fused = self.freq_fold > 1 and self.input_channels == 1 and (
            self.fuse_head is True) and not mixed

        out = ResUNet30Base(self.input_channels, self.output_channels,
                            self.K, freq_fold=self.freq_fold,
                            l1_layout=self.l1_layout,
                            sparse_conv=self.sparse_conv,
                            quantize=self.quantize,
                            fused_head=fused, remat=self.remat,
                            name="base")(x, film, train)

        if fused:
            h, w_after, b_after = out
            waveform = apply_fused_head_and_reconstruct(
                h, w_after, b_after, real_in, imag_in, origin_t,
                audio_length, self.stft_cfg, self.freq_fold,
                self.output_channels, self.K,
                precision=self.dsp_precision,
                interpret=backend not in ("tpu", "axon"))
            return {"waveform": waveform}

        # restore original time extent (reference resunet.py:572-574); the
        # dropped Nyquist bin is handled exactly by the truncated-Nyquist
        # mask+ISTFT path inside apply_mask_and_reconstruct
        x = out[:, :origin_t]

        waveform = apply_mask_and_reconstruct(
            x, real_in, imag_in, audio_length, self.stft_cfg,
            self.output_channels, self.K, precision=self.dsp_precision)
        return {"waveform": waveform}
