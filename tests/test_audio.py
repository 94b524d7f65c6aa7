"""Audio IO + resampling tests."""
import numpy as np
import pytest
import jax.numpy as jnp

from lass_tpu.audio.io import read_wav, write_wav
from lass_tpu.audio.resample import resample, resample_np, _output_length


class TestWavIO:
    def test_roundtrip_16bit(self, tmp_path, rng):
        x = (rng.rand(1, 1000).astype(np.float32) * 2 - 1) * 0.8
        p = str(tmp_path / "a.wav")
        write_wav(p, x, 16000, bits=16)
        y, sr = read_wav(p)
        assert sr == 16000 and y.shape == (1, 1000)
        np.testing.assert_allclose(y, x, atol=2.0 / 32768)

    def test_roundtrip_float32_stereo(self, tmp_path, rng):
        x = (rng.rand(2, 500).astype(np.float32) * 2 - 1) * 0.5
        p = str(tmp_path / "b.wav")
        write_wav(p, x, 44100, bits=32)
        y, sr = read_wav(p)
        assert sr == 44100 and y.shape == (2, 500)
        np.testing.assert_allclose(y, x, atol=1e-7)

    def test_matches_stdlib_wave_16bit(self, tmp_path, rng):
        import wave

        x = (rng.rand(200) * 2 - 1 * 0.9).astype(np.float32)
        ints = (np.clip(x, -1, 1) * 32767).astype("<i2")
        p = str(tmp_path / "c.wav")
        with wave.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(ints.tobytes())
        y, sr = read_wav(p)
        assert sr == 8000
        np.testing.assert_allclose(y[0], ints.astype(np.float32) / 32768.0,
                                   atol=1e-7)

    def test_rejects_garbage(self, tmp_path):
        p = tmp_path / "bad.wav"
        p.write_bytes(b"not a wav file at all")
        with pytest.raises(ValueError):
            read_wav(str(p))


class TestResample:
    @pytest.mark.parametrize("orig,new", [(32000, 48000), (44100, 16000),
                                          (48000, 16000)])
    def test_sine_preserved(self, orig, new, rng):
        t = np.arange(orig) / orig  # 1 second
        f0 = 440.0
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = resample_np(x, orig, new)
        assert y.shape[-1] == _output_length(len(x), orig, new)
        t2 = np.arange(len(y)) / new
        ref = np.sin(2 * np.pi * f0 * t2).astype(np.float32)
        # ignore filter edge transients
        m = slice(1000, len(y) - 1000)
        err = np.abs(y[m] - ref[m]).max()
        assert err < 5e-3, err

    def test_device_matches_host(self, rng):
        x = rng.randn(2, 3200).astype(np.float32)
        a = resample_np(x, 32000, 48000)
        b = np.asarray(resample(jnp.asarray(x), 32000, 48000))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_identity(self, rng):
        x = rng.randn(100).astype(np.float32)
        np.testing.assert_array_equal(resample_np(x, 16000, 16000), x)
