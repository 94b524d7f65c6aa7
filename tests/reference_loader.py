"""Load the ACTUAL reference implementation (/root/reference) for parity
tests, with its missing native deps stubbed.

The reference imports torchlibrosa (STFT/ISTFT/magphase/Spectrogram/
LogmelFilterBank/SpecAugmentation) and torchvision, neither of which is in
this image. The stubs here re-express torchlibrosa's DSP on top of
torch.stft/torch.istft — an INDEPENDENT oracle from lass_tpu's fused
windowed-DFT matmuls (torchlibrosa's conv-basis STFT is numerically
equivalent to torch.stft with the same window/center/pad settings, which
tests/test_stft.py pins separately).

Reference modules are loaded under synthetic package names (no sys.path
mutation) so the reference's `scripts/`, `models/` etc. never shadow this
repo's packages during the same pytest process.
"""
from __future__ import annotations

import importlib
import importlib.machinery
import importlib.util
import sys
import types


def _module(name: str) -> types.ModuleType:
    """A stub module with a real ModuleSpec (importlib.util.find_spec on an
    already-imported module raises if __spec__ is None — transformers
    probes torchvision that way)."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _install_torchlibrosa_stub() -> None:
    if "torchlibrosa" in sys.modules:
        return
    import torch
    import torch.nn as nn

    class STFT(nn.Module):
        """torchlibrosa.stft.STFT: (B, L) -> (real, imag), each
        (B, 1, T, F)."""

        def __init__(self, n_fft, hop_length, win_length, window="hann",
                     center=True, pad_mode="reflect",
                     freeze_parameters=True):
            super().__init__()
            assert window == "hann" and center
            self.n_fft, self.hop = n_fft, hop_length
            self.win_length, self.pad_mode = win_length, pad_mode
            self.register_buffer("w", torch.hann_window(win_length))

        def forward(self, x):
            spec = torch.stft(x, self.n_fft, self.hop, self.win_length,
                              self.w, center=True, pad_mode=self.pad_mode,
                              normalized=False, onesided=True,
                              return_complex=True)
            spec = spec.transpose(1, 2)[:, None]  # (B, 1, T, F)
            return spec.real, spec.imag

    class ISTFT(nn.Module):
        """torchlibrosa.stft.ISTFT: (real, imag, length) with (B, 1, T, F)
        inputs -> (B, 1, length)."""

        def __init__(self, n_fft, hop_length, win_length, window="hann",
                     center=True, pad_mode="reflect",
                     freeze_parameters=True):
            super().__init__()
            assert window == "hann" and center
            self.n_fft, self.hop = n_fft, hop_length
            self.win_length = win_length
            self.register_buffer("w", torch.hann_window(win_length))

        def forward(self, real, imag, length):
            spec = torch.complex(real[:, 0], imag[:, 0]).transpose(1, 2)
            wav = torch.istft(spec, self.n_fft, self.hop, self.win_length,
                              self.w, center=True, length=length)
            return wav[:, None]

    def magphase(real, imag):
        mag = (real ** 2 + imag ** 2) ** 0.5
        cos = real / torch.clamp(mag, 1e-10, np.inf)
        sin = imag / torch.clamp(mag, 1e-10, np.inf)
        return mag, cos, sin

    class Spectrogram(nn.Module):
        """(B, L) -> (B, 1, T, F) power spectrogram (power=2.0)."""

        def __init__(self, n_fft, hop_length, win_length, window="hann",
                     center=True, pad_mode="reflect", power=2.0,
                     freeze_parameters=True):
            super().__init__()
            self.stft = STFT(n_fft, hop_length, win_length, window, center,
                             pad_mode)
            self.power = power

        def forward(self, x):
            real, imag = self.stft(x)
            spec = real ** 2 + imag ** 2
            if self.power != 2.0:
                spec = spec ** (self.power / 2.0)
            return spec

    class LogmelFilterBank(nn.Module):
        """(B, 1, T, F) power spec -> (B, 1, T, n_mels) log-mel dB
        (librosa slaney filters; power_to_db ref/amin/top_db)."""

        def __init__(self, sr, n_fft, n_mels, fmin, fmax, ref=1.0,
                     amin=1e-10, top_db=None, is_log=True,
                     freeze_parameters=True):
            super().__init__()
            from lass_tpu.dsp.mel import mel_filterbank
            self.register_buffer(
                "melW", torch.from_numpy(
                    mel_filterbank(sr, n_fft, n_mels, fmin, fmax)))
            self.ref, self.amin, self.top_db = ref, amin, top_db
            self.is_log = is_log

        def forward(self, x):
            mel = torch.matmul(x, self.melW)
            if not self.is_log:
                return mel
            db = 10.0 * torch.log10(torch.clamp(mel, min=self.amin))
            db -= 10.0 * np.log10(max(self.amin, self.ref))
            if self.top_db is not None:
                db = torch.clamp(db, min=db.max().item() - self.top_db)
            return db

    class SpecAugmentation(nn.Module):
        """Train-only augmentation; identity for eval-mode parity runs."""

        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    tl = _module("torchlibrosa")
    tl_stft = _module("torchlibrosa.stft")
    tl_aug = _module("torchlibrosa.augmentation")
    for name, obj in [("STFT", STFT), ("ISTFT", ISTFT),
                      ("magphase", magphase), ("Spectrogram", Spectrogram),
                      ("LogmelFilterBank", LogmelFilterBank)]:
        setattr(tl_stft, name, obj)
        setattr(tl, name, obj)
    tl_aug.SpecAugmentation = SpecAugmentation
    tl.SpecAugmentation = SpecAugmentation
    tl.stft, tl.augmentation = tl_stft, tl_aug
    sys.modules["torchlibrosa"] = tl
    sys.modules["torchlibrosa.stft"] = tl_stft
    sys.modules["torchlibrosa.augmentation"] = tl_aug


def _install_torchvision_stub() -> None:
    if "torchvision" in sys.modules:
        return
    import torch.nn as nn

    tv = _module("torchvision")
    ops = _module("torchvision.ops")
    misc = _module("torchvision.ops.misc")

    class FrozenBatchNorm2d(nn.Module):  # referenced, never constructed
        pass

    misc.FrozenBatchNorm2d = FrozenBatchNorm2d
    ops.misc = misc
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.misc"] = misc


def _synthetic_package(name: str, path: str) -> None:
    if name in sys.modules:
        return
    pkg = _module(name)
    pkg.__path__ = [path]
    pkg.__package__ = name
    sys.modules[name] = pkg


def load_reference_resunet():
    """Import the reference models/resunet.py (torch) with stubs."""
    _install_torchlibrosa_stub()
    _synthetic_package("models", f"{REFERENCE_ROOT}/models")
    return importlib.import_module("models.resunet")


def load_reference_pann():
    """Import the reference open_clip/pann_model.py under the synthetic
    package (same stubs as htsat)."""
    _install_torchlibrosa_stub()
    _install_torchvision_stub()
    _synthetic_package("ref_open_clip",
                       f"{REFERENCE_ROOT}/models/CLAP/open_clip")
    return importlib.import_module("ref_open_clip.pann_model")


def load_reference_htsat():
    """Import the reference open_clip/htsat.py under a synthetic package
    (skips open_clip/__init__.py, which drags in the whole factory)."""
    _install_torchlibrosa_stub()
    _install_torchvision_stub()
    _synthetic_package("ref_open_clip",
                       f"{REFERENCE_ROOT}/models/CLAP/open_clip")
    return importlib.import_module("ref_open_clip.htsat")


def _install_librosa_stub() -> None:
    """librosa.load on top of this repo's wav reader + resampler —
    the evaluator only calls librosa.load(path, sr=..., mono=True)
    (dcase_evaluator.py:73-74)."""
    if "librosa" in sys.modules:
        return
    from lass_tpu.audio.io import read_wav
    from lass_tpu.audio.resample import resample_np

    lib = _module("librosa")

    def load(path, sr=22050, mono=True):
        audio, rate = read_wav(path)
        out = audio.mean(axis=0) if (mono and audio.shape[0] > 1) \
            else audio[0]
        if sr is not None and rate != sr:
            out = resample_np(out, rate, sr)
            rate = sr
        return out.astype(np.float32), rate

    lib.load = load
    sys.modules["librosa"] = lib


def load_reference_dcase_evaluator():
    """Import the ACTUAL reference dcase_evaluator.py with its heavy /
    unavailable deps stubbed: librosa (wav load), lightning.pytorch (only
    a type annotation), models.clap_encoder + models.audiosep (the
    evaluator's __call__ touches neither — the pl_model is injected)."""
    _install_torchlibrosa_stub()
    _install_librosa_stub()

    if "lightning" not in sys.modules:
        lightning = _module("lightning")
        pl = _module("lightning.pytorch")
        pl.LightningModule = object
        lightning.pytorch = pl
        sys.modules["lightning"] = lightning
        sys.modules["lightning.pytorch"] = pl

    _synthetic_package("models", f"{REFERENCE_ROOT}/models")
    if "models.clap_encoder" not in sys.modules:
        stub = _module("models.clap_encoder")
        stub.CLAP_Encoder = object
        sys.modules["models.clap_encoder"] = stub
    if "models.audiosep" not in sys.modules:
        stub = _module("models.audiosep")
        stub.AudioSep = object
        stub.get_model_class = lambda *a, **k: None
        sys.modules["models.audiosep"] = stub

    if "utils" not in sys.modules:
        loader = importlib.machinery.SourceFileLoader(
            "utils", f"{REFERENCE_ROOT}/utils.py")
        spec = importlib.util.spec_from_loader("utils", loader)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["utils"] = mod
        loader.exec_module(mod)

    loader = importlib.machinery.SourceFileLoader(
        "ref_dcase_evaluator", f"{REFERENCE_ROOT}/dcase_evaluator.py")
    spec = importlib.util.spec_from_loader("ref_dcase_evaluator", loader)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_dcase_evaluator"] = mod
    loader.exec_module(mod)
    return mod
