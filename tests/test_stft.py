"""Golden tests: lass_tpu DSP vs torch.stft/istft (the librosa/torchlibrosa
convention the reference model depends on — resunet.py:284-302)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lass_tpu.dsp import STFTConfig, stft, istft, magphase, wav_to_spectrogram_phase


def torch_stft(x: np.ndarray, cfg: STFTConfig):
    win = torch.hann_window(cfg.effective_win_length, periodic=True)
    out = torch.stft(
        torch.from_numpy(x).float(),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.effective_win_length,
        window=win,
        center=cfg.center,
        pad_mode=cfg.pad_mode,
        normalized=False,
        onesided=True,
        return_complex=True,
    )  # (B, F, T)
    return out.real.numpy().transpose(0, 2, 1), out.imag.numpy().transpose(0, 2, 1)


CONFIGS = [
    STFTConfig(n_fft=1024, hop_length=160),                      # ResUNet30 front-end
    STFTConfig(n_fft=512, hop_length=160),                       # multistft 512 win
    STFTConfig(n_fft=256, hop_length=160),                       # multistft 256 win
    STFTConfig(n_fft=2048, hop_length=160),                      # multistft 2048 win
    STFTConfig(n_fft=1024, hop_length=480),                      # HTSAT front-end
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_stft_matches_torch(cfg, rng):
    x = rng.randn(3, 16000).astype(np.float32)
    r_ref, i_ref = torch_stft(x, cfg)
    r, i = stft(jnp.asarray(x), cfg)
    assert r.shape == r_ref.shape
    scale = np.abs(r_ref).max()
    np.testing.assert_allclose(np.asarray(r), r_ref, atol=2e-4 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(i), i_ref, atol=2e-4 * scale, rtol=0)


def test_stft_frame_count_matches_reference_shape():
    # 10 s at 16 kHz with hop 160 -> 1001 frames, 513 bins (SURVEY §7 static shapes)
    cfg = STFTConfig(n_fft=1024, hop_length=160)
    r, i = stft(jnp.zeros((1, 160000)), cfg)
    assert r.shape == (1, 1001, 513)


@pytest.mark.parametrize("cfg", CONFIGS[:3])
def test_istft_roundtrip(cfg, rng):
    x = rng.randn(2, 16000).astype(np.float32)
    r, i = stft(jnp.asarray(x), cfg)
    y = istft(r, i, 16000, cfg)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_istft_matches_torch_on_modified_spectrum(rng):
    """ISTFT must match torch.istft on a NON-self-consistent spectrum (the
    masked case the model actually produces)."""
    cfg = STFTConfig(n_fft=1024, hop_length=160)
    x = rng.randn(2, 16000).astype(np.float32)
    r, i = stft(jnp.asarray(x), cfg)
    mask = (0.3 + 0.7 * rng.rand(*r.shape)).astype(np.float32)
    r_m = np.asarray(r) * mask
    i_m = np.asarray(i) * mask

    spec = torch.complex(
        torch.from_numpy(r_m.transpose(0, 2, 1)),
        torch.from_numpy(i_m.transpose(0, 2, 1)),
    )
    win = torch.hann_window(cfg.n_fft, periodic=True)
    y_ref = torch.istft(
        spec, n_fft=cfg.n_fft, hop_length=cfg.hop_length, window=win,
        center=True, length=16000,
    ).numpy()

    y = np.asarray(istft(jnp.asarray(r_m), jnp.asarray(i_m), 16000, cfg))
    np.testing.assert_allclose(y, y_ref, atol=2e-4 * np.abs(y_ref).max())


def test_magphase_semantics(rng):
    r = rng.randn(4, 8).astype(np.float32)
    i = rng.randn(4, 8).astype(np.float32)
    mag, cos, sin = magphase(jnp.asarray(r), jnp.asarray(i))
    np.testing.assert_allclose(np.asarray(mag), np.sqrt(r**2 + i**2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cos)**2 + np.asarray(sin)**2,
                               np.ones((4, 8)), rtol=1e-5)
    # zero input: mag 0, cos/sin 0 (clamped denominator), no NaNs
    mag, cos, sin = magphase(jnp.zeros((1,)), jnp.zeros((1,)))
    assert float(mag[0]) == 0.0 and np.isfinite(float(cos[0]))


def test_wav_to_spectrogram_phase_layout(rng):
    x = rng.randn(2, 1, 16000).astype(np.float32)
    mag, cos, sin = wav_to_spectrogram_phase(jnp.asarray(x))
    assert mag.shape == (2, 101, 513, 1)
    r_ref, i_ref = torch_stft(x[:, 0], STFTConfig())
    np.testing.assert_allclose(
        np.asarray(mag)[..., 0], np.sqrt(r_ref**2 + i_ref**2), atol=1e-3)


def test_istft_truncated_nyquist_exact():
    """istft(truncated_nyquist) == istft with an explicitly zero Nyquist."""
    import numpy as np

    from lass_tpu.dsp.stft import STFTConfig, istft

    rng = np.random.RandomState(7)
    cfg = STFTConfig(n_fft=256, hop_length=160)
    real = rng.randn(2, 11, 129).astype(np.float32)
    imag = rng.randn(2, 11, 129).astype(np.float32)
    real[..., -1] = 0.0
    imag[..., -1] = 0.0
    want = istft(jnp.asarray(real), jnp.asarray(imag), 1600, cfg)
    got = istft(jnp.asarray(real[..., :-1]), jnp.asarray(imag[..., :-1]),
                1600, cfg, truncated_nyquist=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
