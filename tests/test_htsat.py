"""HTSAT component parity tests vs torch oracles + full-forward checks."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from lass_tpu.dsp.mel import LogMelConfig, log_mel_spectrogram, mel_filterbank
from lass_tpu.models.clap.htsat import (
    HTSAT, HTSATConfig, SwinBlock, _bicubic_matrix, _relative_position_index,
    _shift_attn_mask)


class TestMel:
    def test_filterbank_properties(self):
        fb = mel_filterbank(48000, 1024, 64, 50.0, 14000.0)  # (513, 64)
        assert fb.shape == (513, 64)
        assert (fb >= 0).all()
        # each filter is a single triangle: unimodal with one argmax
        for m in range(64):
            col = fb[:, m]
            assert col.sum() > 0
            peak = col.argmax()
            assert (np.diff(col[:peak + 1]) >= -1e-9).all()
            assert (np.diff(col[peak:]) <= 1e-9).all()
        # center frequencies increase
        centers = fb.argmax(axis=0)
        assert (np.diff(centers) >= 0).all()

    def test_logmel_shapes_and_silence_floor(self, rng):
        x = jnp.asarray(rng.randn(2, 48000).astype(np.float32) * 0.1)
        mel = log_mel_spectrogram(x, LogMelConfig())
        assert mel.shape == (2, 101, 64)
        silence = log_mel_spectrogram(jnp.zeros((1, 48000)), LogMelConfig())
        np.testing.assert_allclose(np.asarray(silence), -100.0, atol=1e-3)


def test_bicubic_matrix_matches_torch():
    src, dst = 101, 128
    x = np.random.RandomState(0).randn(1, 1, src, 7).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), (dst, x.shape[3]), mode="bicubic",
        align_corners=True).numpy()
    w = _bicubic_matrix(src, dst)
    out = np.einsum("ot,bctf->bcof", w, x)
    np.testing.assert_allclose(out, ref, atol=2e-5)


class TorchSwinOracle(torch.nn.Module):
    """Reference Swin block math (htsat.py:487-633) with explicit weights."""

    def __init__(self, dim, res, heads, window, shift):
        super().__init__()
        self.dim, self.res, self.heads = dim, res, heads
        self.window, self.shift = window, shift
        self.norm1 = torch.nn.LayerNorm(dim)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.qkv = torch.nn.Linear(dim, 3 * dim)
        self.proj = torch.nn.Linear(dim, dim)
        self.fc1 = torch.nn.Linear(dim, dim * 4)
        self.fc2 = torch.nn.Linear(dim * 4, dim)
        self.bias_table = torch.nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)

    def forward(self, x):
        h, w = self.res
        win, shift = self.window, self.shift
        b, l, c = x.shape
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        if shift:
            x = torch.roll(x, (-shift, -shift), (1, 2))
        x = x.view(b, h // win, win, w // win, win, c)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)

        bw, n, _ = x.shape
        qkv = self.qkv(x).reshape(bw, n, 3, self.heads, c // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (c // self.heads) ** -0.5, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        idx = torch.from_numpy(
            _relative_position_index(win).reshape(-1)).long()
        bias = self.bias_table[idx].reshape(n, n, self.heads).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if shift:
            mask = torch.from_numpy(_shift_attn_mask(h, w, win, shift))
            nw = mask.shape[0]
            attn = attn.view(bw // nw, nw, self.heads, n, n) \
                + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(bw, self.heads, n, n)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(bw, n, c)
        x = self.proj(x)

        x = x.view(-1, h // win, w // win, win, win, c)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        if shift:
            x = torch.roll(x, (shift, shift), (1, 2))
        x = shortcut + x.view(b, l, c)
        return x + self.fc2(torch.nn.functional.gelu(self.fc1(
            self.norm2(x))))


@pytest.mark.parametrize("shift", [0, 4])
def test_swin_block_matches_torch(shift, rng):
    dim, res, heads, window = 16, (16, 16), 4, 8
    torch.manual_seed(0)
    oracle = TorchSwinOracle(dim, res, heads, window, shift).eval()
    x = rng.randn(2, 256, dim).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()

    def lin(mod):
        return {"kernel": jnp.asarray(mod.weight.detach().numpy().T.copy()),
                "bias": jnp.asarray(mod.bias.detach().numpy().copy())}

    def ln(mod):
        return {"scale": jnp.asarray(mod.weight.detach().numpy().copy()),
                "bias": jnp.asarray(mod.bias.detach().numpy().copy())}

    params = {
        "norm1": ln(oracle.norm1),
        "norm2": ln(oracle.norm2),
        "attn": {
            "qkv": lin(oracle.qkv),
            "proj": lin(oracle.proj),
            "relative_position_bias_table": jnp.asarray(
                oracle.bias_table.detach().numpy().copy()),
        },
        "mlp_fc1": lin(oracle.fc1),
        "mlp_fc2": lin(oracle.fc2),
    }
    block = SwinBlock(dim, res, heads, window, shift)
    out = block.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_reshape_wav2img_matches_reference_permutes(rng):
    cfg = HTSATConfig()
    model = HTSAT(cfg)
    mel = rng.randn(2, 1024, 64).astype(np.float32)
    mine = model._reshape_wav2img(jnp.asarray(mel))
    # reference: (B,C,T,F)->permute(0,1,3,2)->(B,C,F,4,T/4)->permute
    # (0,1,3,2,4)->(B,C,256,256) (htsat.py:1092-1103)
    x = mel[:, None]  # (B,1,T,F)
    x = np.transpose(x, (0, 1, 3, 2))
    x = x.reshape(2, 1, 64, 4, 256)
    x = np.transpose(x, (0, 1, 3, 2, 4)).reshape(2, 1, 256, 256)
    np.testing.assert_allclose(np.asarray(mine)[..., 0], x[:, 0], atol=1e-6)


@pytest.fixture(scope="module")
def tiny_htsat():
    cfg = HTSATConfig(
        spec_size=128, embed_dim=16, depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2), window_size=4,
        mel=LogMelConfig(sample_rate=16000, n_fft=256, hop_length=160,
                         n_mels=32))
    model = HTSAT(cfg)
    wave = jnp.zeros((1, 16000))
    variables = model.init(jax.random.PRNGKey(0), wave, train=False)
    return cfg, model, variables


def test_htsat_tiny_forward(tiny_htsat, rng):
    cfg, model, variables = tiny_htsat
    wave = jnp.asarray(rng.randn(2, 16000).astype(np.float32) * 0.1)
    out = model.apply(variables, wave, train=False)
    assert out["embedding"].shape == (2, cfg.num_features)
    assert out["clipwise_output"].shape == (2, 527)
    assert np.isfinite(np.asarray(out["embedding"])).all()
    assert (np.asarray(out["clipwise_output"]) >= 0).all()


def test_htsat_base_shapes():
    """Full-size HTSAT-base on a 10s 48 kHz clip: embedding must be 1024-d
    (matches HTSAT-base.json embed_dim for the CLAP audio projection)."""
    model = HTSAT(HTSATConfig())
    wave = jnp.zeros((1, 480000))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), wave, train=False))
    out = jax.eval_shape(
        lambda v: model.apply(v, wave, train=False), variables)
    assert out["embedding"].shape == (1, 1024)
    assert out["framewise_output"].shape == (1, 1024, 527)
