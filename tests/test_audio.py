"""Audio IO (WAV + FLAC) + resampling tests."""
import numpy as np
import pytest
import jax.numpy as jnp

from lass_tpu.audio.io import (read_audio, read_audio_bytes, read_wav,
                               write_wav)
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


def _author_flac(subframes, block_size, sample_rate=16000, bps=16,
                 chan_code=None, size_code=4):
    """Hand-author a one-frame FLAC stream straight from the spec, bit
    by bit — independent of encode_flac's choices, so it can exercise
    decoder paths (LPC, stereo decorrelation, escapes, wasted bits) the
    minimal encoder never emits. ``subframes`` is a list of callables
    ``f(bw, sub_bps)`` writing one subframe's bits."""
    from lass_tpu.audio.flac import (_BitWriter, _crc8, _crc16,
                                     _utf8_number)

    nch = len(subframes) if chan_code is None else 2
    code = (nch - 1) if chan_code is None else chan_code
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(block_size, 36)
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)            # 16-bit block size field follows
    bw.write(0, 4)            # sample rate from STREAMINFO
    bw.write(code, 4)
    bw.write(size_code, 3)
    bw.write(0, 1)
    for b in _utf8_number(0):
        bw.write(b, 8)
    bw.write(block_size - 1, 16)
    bw.align()
    header = bw.bytes()
    header += bytes([_crc8(header)])

    body_bw = _BitWriter()
    for i, write_sub in enumerate(subframes):
        sub_bps = bps
        if chan_code == 8 and i == 1:      # left/side: side is bps+1
            sub_bps = bps + 1
        if chan_code == 9 and i == 0:
            sub_bps = bps + 1
        if chan_code == 10 and i == 1:
            sub_bps = bps + 1
        write_sub(body_bw, sub_bps)
    body_bw.align()
    frame = header + body_bw.bytes()
    frame += _crc16(frame).to_bytes(2, "big")
    return bytes(out + frame)


def _verbatim(samples):
    def write(bw, sub_bps):
        bw.write(0, 1)
        bw.write(1, 6)      # VERBATIM
        bw.write(0, 1)      # no wasted bits
        for s in samples:
            bw.write(int(s), sub_bps)
    return write


class TestFlac:
    """lass_tpu/audio/flac.py — the codec behind the reference's
    FLAC-capable loaders (torchaudio.load in audiotext_dataset.py:61;
    wds.torch_audio in models/CLAP/training/data.py)."""

    def test_roundtrip_mono_multiblock(self, tmp_path, rng):
        from lass_tpu.audio.flac import write_flac

        # 10000 samples @ block 4096: two full blocks + odd tail
        ints = (rng.randn(1, 10000) * 8000).clip(-32768, 32767)
        x = ints.astype(np.int16)
        p = str(tmp_path / "a.flac")
        write_flac(p, x, 16000)
        y, sr = read_audio(p)
        assert sr == 16000 and y.shape == (1, 10000)
        # FLAC is lossless: bit-exact roundtrip
        np.testing.assert_array_equal(
            np.round(y * 32768.0).astype(np.int16), x)

    def test_roundtrip_stereo_float(self, tmp_path, rng):
        from lass_tpu.audio.flac import write_flac

        x = ((rng.rand(2, 5000) * 2 - 1) * 0.7).astype(np.float32)
        p = str(tmp_path / "s.flac")
        write_flac(p, x, 44100)
        y, sr = read_audio(p)
        assert sr == 44100 and y.shape == (2, 5000)
        # lossless after the encoder's int16 quantization
        np.testing.assert_allclose(y, np.round(x * 32767) / 32768,
                                   atol=1e-7)

    def test_compresses(self, rng):
        from lass_tpu.audio.flac import encode_flac

        t = np.arange(16000) / 16000.0
        tone = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        blob = encode_flac(tone[None, :], 16000)
        assert len(blob) < 2 * 16000 * 0.8  # beats raw PCM16 by >20%

    def test_mono_flag_and_sniffing(self, tmp_path, rng):
        from lass_tpu.audio.flac import encode_flac

        x = ((rng.rand(2, 800) * 2 - 1) * 0.5).astype(np.float32)
        blob = encode_flac(x, 8000)
        y, sr = read_audio_bytes(blob, mono=True)
        assert y.shape == (1, 800)
        q = np.round(x * 32767) / 32768
        np.testing.assert_allclose(y[0], q.mean(axis=0), atol=1e-6)
        # the same entry point transparently reads WAV (reference
        # loaders are container-agnostic)
        wp = str(tmp_path / "w.wav")
        write_wav(wp, x, 8000, bits=16)
        yw, srw = read_audio(wp)
        assert srw == 8000 and yw.shape == (2, 800)
        with pytest.raises(ValueError):
            read_audio_bytes(b"\x00" * 64)

    def test_lpc_subframe(self):
        """Hand-authored LPC frame: residuals computed here from the
        spec recurrence res[i] = x[i] - (sum c_j*x[i-1-j] >> shift);
        the decoder must invert it exactly."""
        from lass_tpu.audio.flac import _BitWriter, _write_rice

        rng = np.random.RandomState(7)
        n, order, shift = 64, 3, 5
        coeffs = [37, -21, 9]
        x = (rng.randn(n) * 3000).astype(np.int64)
        res = [int(x[i]) - (int(sum(c * x[i - 1 - j]
                                    for j, c in enumerate(coeffs))) >> shift)
               for i in range(order, n)]

        def sub(bw, sub_bps):
            bw.write(0, 1)
            bw.write(0x20 | (order - 1), 6)   # LPC, order
            bw.write(0, 1)
            for w in x[:order]:
                bw.write(int(w), sub_bps)
            bw.write(7 - 1, 4)                # precision 7 bits
            bw.write(shift, 5)
            for c in coeffs:
                bw.write(c, 7)
            bw.write(0, 2)                    # rice, 4-bit params
            bw.write(0, 4)                    # one partition
            bw.write(6, 4)
            _write_rice(bw, np.asarray(res), 6)

        blob = _author_flac([sub], n)
        y, sr = read_audio_bytes(blob)
        np.testing.assert_array_equal(
            np.round(y[0] * 32768.0).astype(np.int64), x)

    @pytest.mark.parametrize("chan_code", [8, 9, 10])
    def test_stereo_decorrelation(self, chan_code):
        """left/side, right/side and mid/side frames reconstruct the
        original L/R exactly (spec: side = L-R, mid = (L+R)>>1)."""
        rng = np.random.RandomState(chan_code)
        n = 48
        left = (rng.randn(n) * 900).astype(np.int64)
        right = (rng.randn(n) * 900).astype(np.int64)
        side = left - right
        mid = (left + right) >> 1
        subs = {8: [_verbatim(left), _verbatim(side)],
                9: [_verbatim(side), _verbatim(right)],
                10: [_verbatim(mid), _verbatim(side)]}[chan_code]
        blob = _author_flac(subs, n, chan_code=chan_code)
        y, _ = read_audio_bytes(blob)
        got = np.round(y * 32768.0).astype(np.int64)
        np.testing.assert_array_equal(got[0], left)
        np.testing.assert_array_equal(got[1], right)

    def test_escape_partitions_and_constant(self):
        """Rice escape partitions (raw n-bit residuals and the
        raw_bits=0 all-zero form) on FIXED order-0 subframes, plus a
        CONSTANT subframe with wasted bits."""
        n = 32
        rng = np.random.RandomState(3)
        vals = np.clip(rng.randn(n) * 50, -127, 127).astype(np.int64)

        def fixed0_escape(bw, sub_bps):
            bw.write(0, 1)
            bw.write(8, 6)        # FIXED order 0
            bw.write(0, 1)
            bw.write(0, 2)
            bw.write(0, 4)
            bw.write(15, 4)       # escape
            bw.write(8, 5)        # raw 8-bit residuals
            for v in vals:
                bw.write(int(v), 8)

        y, _ = read_audio_bytes(_author_flac([fixed0_escape], n))
        np.testing.assert_array_equal(
            np.round(y[0] * 32768.0).astype(np.int64), vals)

        def fixed0_zeros(bw, sub_bps):
            bw.write(0, 1)
            bw.write(8, 6)
            bw.write(0, 1)
            bw.write(0, 2)
            bw.write(0, 4)
            bw.write(15, 4)
            bw.write(0, 5)        # raw_bits=0: all-zero partition

        y, _ = read_audio_bytes(_author_flac([fixed0_zeros], n))
        np.testing.assert_array_equal(y[0], np.zeros(n, np.float32))

        def const_wasted(bw, sub_bps):
            bw.write(0, 1)
            bw.write(0, 6)        # CONSTANT
            bw.write(1, 1)        # wasted-bits flag
            bw.write(1, 2)        # unary "01" -> wasted = 2
            bw.write(25, sub_bps - 2)

        y, _ = read_audio_bytes(_author_flac([const_wasted], n))
        np.testing.assert_array_equal(
            np.round(y[0] * 32768.0).astype(np.int64),
            np.full(n, 25 << 2, np.int64))

    def test_native_matches_python(self, rng):
        """The C++ decoder (native/lassio.cpp:decode_flac) must equal the
        pure-python reference decoder bit-for-bit on every stream shape:
        encoder output (fixed predictors, multi-block, stereo) and the
        hand-authored LPC / decorrelated / escaped streams above."""
        from lass_tpu.audio.flac import decode_flac_bytes, encode_flac
        from lass_tpu.audio.io import _NATIVE

        if _NATIVE is None or not hasattr(_NATIVE, "decode_flac"):
            pytest.skip("native lassio not built (python native/build.py)")

        streams = [
            encode_flac((rng.randn(1, 9000) * 4000).clip(-32768, 32767)
                        .astype(np.int16), 16000),
            encode_flac((rng.randn(2, 5000) * 2000).clip(-32768, 32767)
                        .astype(np.int16), 44100),
        ]
        left = (np.random.RandomState(1).randn(40) * 700).astype(np.int64)
        right = (np.random.RandomState(2).randn(40) * 700).astype(np.int64)
        for code in (8, 9, 10):
            side, mid = left - right, (left + right) >> 1
            subs = {8: [_verbatim(left), _verbatim(side)],
                    9: [_verbatim(side), _verbatim(right)],
                    10: [_verbatim(mid), _verbatim(side)]}[code]
            streams.append(_author_flac(subs, 40, chan_code=code))

        for i, blob in enumerate(streams):
            for mono in (False, True):
                py, sr_py = decode_flac_bytes(blob, mono)
                cc, sr_cc = _NATIVE.decode_flac(blob, mono)
                assert sr_py == sr_cc
                np.testing.assert_array_equal(np.asarray(cc), py,
                                              err_msg=f"stream {i}")

    @pytest.mark.parametrize("bps,size_code", [(8, 1), (24, 6)])
    def test_other_bit_depths(self, bps, size_code):
        rng = np.random.RandomState(bps)
        n = 24
        lim = (1 << (bps - 1)) - 1
        vals = np.clip(rng.randn(n) * (1 << (bps - 3)),
                       -lim, lim).astype(np.int64)
        blob = _author_flac([_verbatim(vals)], n, bps=bps,
                            size_code=size_code)
        y, _ = read_audio_bytes(blob)
        np.testing.assert_array_equal(
            np.round(y[0] * float(1 << (bps - 1))).astype(np.int64), vals)


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
