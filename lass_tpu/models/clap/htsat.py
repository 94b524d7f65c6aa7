"""HTSAT (Hierarchical Token-Semantic Audio Transformer) in JAX/flax.

Behavioral spec: reference models/CLAP/open_clip/htsat.py — the CLAP audio
branch. HTSAT-base (create_htsat_model :1275-1288): spec_size 256, patch
4x4 stride 4, embed 128, depths [2,2,12,2], heads [4,8,16,32], window 8,
527 classes, log-mel front-end at 48 kHz/1024 fft/480 hop/64 mels
(:864-902), freq-ratio-4 time-to-frequency interleave (reshape_wav2img
:1076-1103), shifted-window attention with relative position bias
(:352-464), PatchMerging (:640-680), token-semantic tscam head + avgpool
"embedding" (:1012-1062). Non-fusion path (LASS uses enable_fusion=False,
clap_encoder.py:22).

TPU-first notes:
- mel front-end = fused DFT conv + one filterbank matmul (lass_tpu.dsp.mel);
- the reference's bicubic time interpolation (align_corners=True, used to
  stretch 1001 frames to 1024) is ONE precomputed (1024, T) matmul;
- window partition/reverse are reshapes+transposes, masks and relative
  position indices are trace-time numpy constants;
- everything is static-shaped; dropout/specaug/droppath only exist under
  ``train=True`` (CLAP is frozen for LASS, clap_encoder.py:38-41).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lass_tpu.dsp.mel import LogMelConfig, log_mel_spectrogram


@dataclasses.dataclass(frozen=True)
class HTSATConfig:
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: int = 4
    in_chans: int = 1
    num_classes: int = 527
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 12, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    mel: LogMelConfig = LogMelConfig()
    # long-audio mel fusion (reference htsat.py:116-150, :979-991,
    # :1150-1207): input becomes a (B, 4, T, n_mels) stack of 3 random mel
    # chunks + the resized global mel, plus a (B,) `longer` flag
    enable_fusion: bool = False
    fusion_type: str = "None"  # daf/aff/iaff x _1d/_2d, or channel_map

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.mel.n_mels

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))


def htsat_base_config() -> HTSATConfig:
    return HTSATConfig()


def htsat_tiny_config() -> HTSATConfig:
    return HTSATConfig(embed_dim=96, depths=(2, 2, 6, 2))


def htsat_large_config() -> HTSATConfig:
    return HTSATConfig(embed_dim=256, depths=(2, 2, 12, 2))


# ---------------------------------------------------------------------------
# trace-time constants
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _relative_position_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, w*w, w*w)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # (w*w, w*w)


@functools.lru_cache(maxsize=None)
def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """(nW, w*w, w*w) 0/-100 mask for SW-MSA (reference htsat.py:549-575)."""
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift),
               slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    windows = img.reshape(h // window, window, w // window, window)
    windows = windows.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _bicubic_matrix(src: int, dst: int, a: float = -0.75) -> np.ndarray:
    """(dst, src) torch-style bicubic align_corners=True interpolation
    weights (Keys kernel, A=-0.75)."""
    if src == dst:
        return np.eye(src, dtype=np.float32)

    def kernel(x):
        x = np.abs(x)
        return np.where(
            x <= 1, (a + 2) * x**3 - (a + 3) * x**2 + 1,
            np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0))

    scale = (src - 1) / (dst - 1)
    out = np.zeros((dst, src))
    for i in range(dst):
        pos = i * scale
        base = int(np.floor(pos))
        frac = pos - base
        for t in range(-1, 3):
            idx = min(max(base + t, 0), src - 1)
            out[i, idx] += kernel(t - frac)
    return out.astype(np.float32)


def _window_partition(x: jax.Array, window: int) -> jax.Array:
    """(B, H, W, C) -> (B * nW, window*window, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def _window_reverse(x: jax.Array, window: int, h: int, w: int) -> jax.Array:
    c = x.shape[-1]
    x = x.reshape(-1, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[np.ndarray]
                 ) -> jax.Array:
        bw, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (hd ** -0.5), qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, nh))
        index = jnp.asarray(_relative_position_index(self.window).reshape(-1))
        bias = table[index].reshape(n, n, nh).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, nh, n, n) \
                + jnp.asarray(mask)[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bw, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = self.input_resolution
        window, shift = self.window, self.shift
        if min(h, w) <= window:
            window, shift = min(h, w), 0
        b, l, c = x.shape

        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        windows = _window_partition(x, window)
        mask = _shift_attn_mask(h, w, window, shift) if shift > 0 else None
        attn_out = WindowAttention(c, window, self.num_heads, self.dtype,
                                   name="attn")(windows, mask)
        x = _window_reverse(attn_out, window, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(b, l, c)
        x = shortcut + x

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        hidden = int(c * self.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.dtype, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    input_resolution: Tuple[int, int]
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = self.input_resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        parts = [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                 x[:, 0::2, 1::2], x[:, 1::2, 1::2]]
        x = jnp.concatenate(parts, axis=-1).reshape(b, (h // 2) * (w // 2),
                                                    4 * c)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class HTSAT(nn.Module):
    """waveform (B, L) at 48 kHz -> {'embedding': (B, num_features),
    'clipwise_output', 'framewise_output', 'fine_grained_embedding'}.

    With cfg.enable_fusion, call with keyword inputs instead:
    ``mel_fusion`` (B, 4, T, n_mels) + ``longer`` (B,) bool — the
    get_audio_features 'fusion' stack (reference htsat.py:1150-1207).
    TPU-first: the local branch is computed for ALL items and selected
    with jnp.where(longer) — no data-dependent gather (exact in eval mode,
    where the reference's in-place indexing semantics coincide)."""

    cfg: HTSATConfig = HTSATConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, waveform: Optional[jax.Array] = None,
                 train: bool = False, *,
                 mel_fusion: Optional[jax.Array] = None,
                 longer: Optional[jax.Array] = None):
        cfg = self.cfg
        from lass_tpu.nn.layers import BatchNorm

        fusion_2d = cfg.enable_fusion and cfg.fusion_type in (
            "daf_2d", "aff_2d", "iaff_2d")
        fusion_1d = cfg.enable_fusion and cfg.fusion_type in (
            "daf_1d", "aff_1d", "iaff_1d")

        if cfg.enable_fusion:
            if mel_fusion is None or longer is None:
                raise ValueError("fusion-enabled HTSAT takes "
                                 "mel_fusion=(B,4,T,M) and longer=(B,)")
            mel4 = mel_fusion.astype(jnp.float32)  # (B, 4, T, M)
            mel4 = BatchNorm(cfg.mel.n_mels, name="bn0")(mel4, train)
            if fusion_1d:
                mel = self._fuse_1d(mel4, longer, train)  # (B, T, M)
                if train:
                    mel = _spec_augment(mel, self.make_rng("specaug"))
                x = self._reshape_wav2img(mel)  # (B, S, S, 1)
            else:  # 2d families / channel_map keep the 4-channel stack
                if train:
                    mel4 = _spec_augment(mel4, self.make_rng("specaug"))
                x = self._reshape_wav2img_multi(mel4)  # (B, S, S, 4)
        else:
            mel = log_mel_spectrogram(waveform, cfg.mel)  # (B, T, n_mels)
            mel = BatchNorm(cfg.mel.n_mels, name="bn0")(mel, train)
            if train:
                mel = _spec_augment(mel, self.make_rng("specaug"))
            x = self._reshape_wav2img(mel)  # (B, S, S, 1)
        frames_num = x.shape[1]

        # patch embed: conv p x p stride p (fusion variants:
        # reference htsat.py:116-202 PatchEmbed)
        grid = cfg.spec_size // cfg.patch_stride
        proj = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                       strides=(cfg.patch_stride, cfg.patch_stride),
                       padding="VALID", dtype=self.dtype,
                       name="patch_embed_proj")
        if fusion_2d:
            x = self._patch_embed_fused_2d(x, longer, proj, train)
        else:
            # channel_map feeds all 4 channels straight into proj
            x = proj(x.astype(self.dtype))
        x = x.reshape(x.shape[0], grid * grid, cfg.embed_dim)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_embed_norm")(x)

        res = (grid, grid)
        for i, depth in enumerate(cfg.depths):
            dim = int(cfg.embed_dim * 2 ** i)
            for j in range(depth):
                shift = 0 if j % 2 == 0 else cfg.window_size // 2
                x = SwinBlock(dim, res, cfg.num_heads[i], cfg.window_size,
                              shift, cfg.mlp_ratio, self.dtype,
                              name=f"layers_{i}_blocks_{j}")(x)
            if i < len(cfg.depths) - 1:
                x = PatchMerging(res, dim, self.dtype,
                                 name=f"layers_{i}_downsample")(x)
                res = (res[0] // 2, res[1] // 2)

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)

        # token-semantic head (reference forward_features :1012-1062)
        b, n, c = x.shape
        down = 2 ** (len(cfg.depths) - 1)
        sf = frames_num // down // cfg.patch_stride
        st = frames_num // down // cfg.patch_stride
        img = x.transpose(0, 2, 1).reshape(b, c, sf, st)
        c_freq_bin = sf // cfg.freq_ratio
        img = img.reshape(b, c, sf // c_freq_bin, c_freq_bin, st)
        img = img.transpose(0, 1, 3, 2, 4).reshape(b, c, c_freq_bin, -1)
        # img: (B, C, c_freq_bin, T')

        fine = jnp.mean(img, axis=2)  # (B, C, T')
        repeat = 8 * cfg.patch_stride
        fine_grained = jnp.repeat(fine.transpose(0, 2, 1), repeat, axis=1)

        latent = jnp.mean(img.reshape(b, c, -1), axis=-1)  # (B, C)

        # tscam conv over NHWC (B, c_freq_bin, T', C) -> (B, 1, T', classes)
        timg = img.transpose(0, 2, 3, 1)
        logits = nn.Conv(cfg.num_classes, (c_freq_bin, 3),
                         padding=((0, 0), (1, 1)), dtype=self.dtype,
                         name="tscam_conv")(timg)
        logits = logits[:, 0].astype(jnp.float32)  # (B, T', classes)
        framewise = jnp.repeat(jax.nn.sigmoid(logits), repeat, axis=1)
        clipwise = jax.nn.sigmoid(jnp.mean(logits, axis=1))

        return {
            "embedding": latent.astype(jnp.float32),
            "fine_grained_embedding": fine_grained.astype(jnp.float32),
            "clipwise_output": clipwise,
            "framewise_output": framewise,
        }

    def _reshape_wav2img(self, mel: jax.Array) -> jax.Array:
        """(B, T, F) -> (B, S, S, 1) freq-ratio interleave
        (reference :1076-1103)."""
        cfg = self.cfg
        b, t, f = mel.shape
        target_t = cfg.spec_size * cfg.freq_ratio
        target_f = cfg.spec_size // cfg.freq_ratio
        if t > target_t or f > target_f:
            raise ValueError(f"mel ({t},{f}) larger than swin input "
                             f"({target_t},{target_f})")
        if t < target_t:
            w = jnp.asarray(_bicubic_matrix(t, target_t))
            mel = jnp.einsum("ot,btf->bof", w, mel)
        if f < target_f:
            w = jnp.asarray(_bicubic_matrix(f, target_f))
            mel = jnp.einsum("of,btf->bto", w, mel)
        # (B, T, F) -> (B, F, ratio, T/ratio) -> (B, F*ratio, T/ratio)
        x = mel.transpose(0, 2, 1)  # (B, F, T)
        x = x.reshape(b, target_f, cfg.freq_ratio, target_t // cfg.freq_ratio)
        x = x.transpose(0, 2, 1, 3)  # (B, ratio, F, T/ratio)
        x = x.reshape(b, cfg.freq_ratio * target_f,
                      target_t // cfg.freq_ratio)
        return x[..., None]

    def _reshape_wav2img_multi(self, mel4: jax.Array) -> jax.Array:
        """(B, C, T, F) -> (B, S, S, C): the reference applies
        reshape_wav2img per channel (htsat.py:1076-1103 operates on BCTF)."""
        b, c = mel4.shape[0], mel4.shape[1]
        flat = mel4.reshape(b * c, mel4.shape[2], mel4.shape[3])
        img = self._reshape_wav2img(flat)[..., 0]  # (B*C, S, S)
        s1, s2 = img.shape[1], img.shape[2]
        return img.reshape(b, c, s1, s2).transpose(0, 2, 3, 1)

    def _fuse_1d(self, mel4: jax.Array, longer: jax.Array, train: bool
                 ) -> jax.Array:
        """1D mel fusion (reference htsat.py:1157-1196): channel 0 is the
        global mel; channels 1:4 go through mel_conv1d (stride-3 conv + BN)
        and are time-concatenated, then attention-fused into the global."""
        from lass_tpu.models.clap.fusion import AFF, DAF, iAFF
        from lass_tpu.nn.layers import BatchNorm

        cfg = self.cfg
        b, _, t, f = mel4.shape
        glob = mel4[:, 0]  # (B, T, F)
        local = mel4[:, 1:].reshape(b * 3, t, f)
        h = nn.Conv(f, (5,), strides=(3,), padding=[(2, 2)],
                    name="mel_conv1d")(local)
        # torch mel_conv1d = Conv1d + BatchNorm1d (momentum 0.1 default)
        h = BatchNorm(f, momentum=0.1, name="mel_conv1d_bn")(h, train)
        t2 = h.shape[1]
        h = h.reshape(b, 3 * t2, f)
        if 3 * t2 >= t:
            h = h[:, :t]
        else:
            h = jnp.pad(h, ((0, 0), (0, t - 3 * t2), (0, 0)))
        fused = self._fusion_block(f)(glob, h, train)
        return jnp.where(longer[:, None, None], fused, glob)

    def _patch_embed_fused_2d(self, x: jax.Array, longer: jax.Array,
                              proj: nn.Module, train: bool) -> jax.Array:
        """2D patch-embed fusion (reference htsat.py:151-190): global
        channel through proj; local channels through a (p, 3p)-stride conv,
        width-concatenated, zero-padded to the global width, fused."""
        cfg = self.cfg
        b = x.shape[0]
        glob = proj(x[..., 0:1].astype(self.dtype))  # (B, gh, gw, E)
        loc = jnp.moveaxis(x[..., 1:4], -1, 1)  # (B, 3, S, S)
        loc = loc.reshape(b * 3, x.shape[1], x.shape[2], 1)
        loc = nn.Conv(cfg.embed_dim,
                      (cfg.patch_size, cfg.patch_size * 3),
                      strides=(cfg.patch_stride, cfg.patch_stride * 3),
                      padding="VALID", dtype=self.dtype,
                      name="mel_conv2d")(loc.astype(self.dtype))
        th, tw = loc.shape[1], loc.shape[2]
        # chunk-major width concat (reference permute(0,2,3,1,4).flatten(3))
        loc = loc.reshape(b, 3, th, tw, cfg.embed_dim)
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(b, th, 3 * tw,
                                                   cfg.embed_dim)
        gw = glob.shape[2]
        if 3 * tw >= gw:
            loc = loc[:, :, :gw]
        else:
            loc = jnp.pad(loc, ((0, 0), (0, 0), (0, gw - 3 * tw), (0, 0)))
        fused = self._fusion_block(cfg.embed_dim)(
            glob.astype(jnp.float32), loc.astype(jnp.float32), train)
        return jnp.where(longer[:, None, None, None], fused,
                         glob.astype(jnp.float32)).astype(self.dtype)

    def _fusion_block(self, channels: int):
        from lass_tpu.models.clap.fusion import AFF, DAF, iAFF

        kind = self.cfg.fusion_type.split("_")[0]
        if kind == "daf":
            return DAF(name="fusion_model")
        if kind == "aff":
            return AFF(channels=channels, name="fusion_model")
        if kind == "iaff":
            return iAFF(channels=channels, name="fusion_model")
        raise NotImplementedError(self.cfg.fusion_type)


def _spec_augment(mel: jax.Array, rng: jax.Array,
                  time_drop_width: int = 64, time_stripes: int = 2,
                  freq_drop_width: int = 8, freq_stripes: int = 2
                  ) -> jax.Array:
    """torchlibrosa SpecAugmentation equivalent (train only,
    htsat.py:896-901): random zeroed time/freq stripes. Accepts (B, T, F)
    or (B, C, T, F) — stripes are shared across channels, as torchlibrosa
    DropStripes broadcasts over the channel dim."""
    if mel.ndim == 4:
        b, c, t, f = mel.shape
        keys = jax.random.split(rng, 4)

        def stripe_mask4(key_pos, key_len, size, width, count):
            starts = jax.random.randint(key_pos, (b, count), 0,
                                        max(size - width, 1))
            lengths = jax.random.randint(key_len, (b, count), 0, width + 1)
            idx = jnp.arange(size)[None, None, :]
            hit = (idx >= starts[..., None]) & (
                idx < (starts + lengths)[..., None])
            return ~jnp.any(hit, axis=1)

        tmask = stripe_mask4(keys[0], keys[1], t, time_drop_width,
                             time_stripes)
        fmask = stripe_mask4(keys[2], keys[3], f, freq_drop_width,
                             freq_stripes)
        return mel * tmask[:, None, :, None] * fmask[:, None, None, :]
    b, t, f = mel.shape
    keys = jax.random.split(rng, 4)

    def stripe_mask(key_pos, key_len, size, width, count):
        starts = jax.random.randint(key_pos, (b, count), 0, max(size - width,
                                                                1))
        lengths = jax.random.randint(key_len, (b, count), 0, width + 1)
        idx = jnp.arange(size)[None, None, :]
        hit = (idx >= starts[..., None]) & (idx < (starts + lengths)[..., None])
        return ~jnp.any(hit, axis=1)  # (B, size) True = keep

    tmask = stripe_mask(keys[0], keys[1], t, time_drop_width, time_stripes)
    fmask = stripe_mask(keys[2], keys[3], f, freq_drop_width, freq_stripes)
    return mel * tmask[:, :, None] * fmask[:, None, :]
