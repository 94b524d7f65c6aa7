"""Native C++ WAV decoder parity vs the pure-python codec."""
import os
import subprocess
import sys

import numpy as np
import pytest

from lass_tpu.audio.io import _load_native, _read_wav_py, read_wav, write_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native():
    mod = _load_native()
    if mod is None:
        subprocess.run([sys.executable,
                        os.path.join(REPO, "native", "build.py")],
                       check=True)
        mod = _load_native()
    assert mod is not None, "native build failed"
    return mod


@pytest.mark.parametrize("bits,channels", [(16, 1), (16, 2), (32, 2)])
def test_native_matches_python(native, tmp_path, rng, bits, channels):
    x = (rng.rand(channels, 1777).astype(np.float32) * 2 - 1) * 0.7
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 22050, bits=bits)
    with open(p, "rb") as f:
        data, sr = native.decode_wav(f.read(), False)
    ref, ref_sr = _read_wav_py(p)
    assert sr == ref_sr == 22050
    np.testing.assert_allclose(data, ref, atol=1e-7)


def test_native_mono_mixdown(native, tmp_path, rng):
    x = (rng.rand(2, 500).astype(np.float32) * 2 - 1) * 0.5
    p = str(tmp_path / "s.wav")
    write_wav(p, x, 16000, bits=32)
    with open(p, "rb") as f:
        data, _ = native.decode_wav(f.read(), True)
    np.testing.assert_allclose(data[0], x.mean(axis=0), atol=1e-7)


def test_native_rejects_garbage(native):
    with pytest.raises(ValueError):
        native.decode_wav(b"definitely not a wav", False)


def test_read_wav_uses_native_transparently(native, tmp_path, rng):
    x = (rng.rand(1, 300).astype(np.float32) * 2 - 1) * 0.5
    p = str(tmp_path / "r.wav")
    write_wav(p, x, 8000)
    out, sr = read_wav(p)
    assert sr == 8000
    np.testing.assert_allclose(out, x, atol=2.0 / 32768)
