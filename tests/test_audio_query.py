"""CLAP audio query path: feature prep, audio encoder, converter, facade."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lass_tpu.dsp.mel import LogMelConfig
from lass_tpu.models.clap.audio_features import (
    prepare_audio, prepare_audio_batch)
from lass_tpu.models.clap.htsat import HTSATConfig


TINY = HTSATConfig(
    spec_size=128, embed_dim=16, depths=(1, 1, 1, 1),
    num_heads=(2, 2, 2, 2), window_size=4,
    mel=LogMelConfig(sample_rate=48000, n_fft=256, hop_length=480,
                     n_mels=32))


class TestPrepareAudio:
    def test_identity_at_max_len(self, rng):
        x = rng.randn(480000).astype(np.float32)
        np.testing.assert_array_equal(prepare_audio(x, 480000), x)

    def test_repeatpad(self, rng):
        x = rng.randn(1000).astype(np.float32)
        out = prepare_audio(x, 3500, data_filling="repeatpad")
        assert out.shape == (3500,)
        np.testing.assert_array_equal(out[:1000], x)
        np.testing.assert_array_equal(out[1000:2000], x)
        np.testing.assert_array_equal(out[3000:], np.zeros(500))

    def test_repeat_and_pad(self, rng):
        x = rng.randn(1000).astype(np.float32)
        rep = prepare_audio(x, 2500, data_filling="repeat")
        np.testing.assert_array_equal(rep[2000:2500], x[:500])
        pad = prepare_audio(x, 2500, data_filling="pad")
        np.testing.assert_array_equal(pad[1000:], np.zeros(1500))

    def test_rand_trunc(self, rng):
        x = rng.randn(5000).astype(np.float32)
        out = prepare_audio(x, 2000, rng=np.random.default_rng(0))
        assert out.shape == (2000,)

    def test_batch(self, rng):
        x = rng.randn(3, 1000).astype(np.float32)
        out = prepare_audio_batch(x, 2500)
        assert out.shape == (3, 2500)


def test_query_encoder_audio_path(rng):
    from lass_tpu.models.clap.roberta import RobertaConfig
    from lass_tpu.models.query_encoder import CLAPQueryEncoder

    enc = CLAPQueryEncoder(
        roberta_cfg=RobertaConfig(vocab_size=100, hidden_size=32,
                                  num_hidden_layers=1, num_attention_heads=4,
                                  intermediate_size=64,
                                  max_position_embeddings=80))
    enc.attach_audio_encoder(htsat_cfg=TINY, sampling_rate=32000,
                             clip_samples=48000)  # 1 s at 48 kHz
    audio = rng.randn(2, 32000).astype(np.float32) * 0.1  # 1 s at 32 kHz
    out = np.asarray(enc.get_query_embed("audio", audio=jnp.asarray(audio)))
    assert out.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)

    # hybrid with ratio 0 must take the audio branch (whole batch embedded,
    # unlike the reference's first-item-only bug)
    out2 = np.asarray(enc.get_query_embed(
        "hybird", audio=jnp.asarray(audio), text=["x", "y"],
        use_text_ratio=0.0, seed=3))
    np.testing.assert_allclose(out, out2, atol=1e-6)
    assert not np.allclose(out2[0], out2[1])


def test_htsat_converter_shapes():
    """Synthetic audio_branch state dict converts into tiny HTSAT params
    matching the model's own init structure."""
    import torch

    from lass_tpu.convert.torch_to_jax import convert_clap_audio_encoder
    from lass_tpu.models.clap.model import CLAPAudioEncoder

    depths = TINY.depths
    rng = np.random.RandomState(0)
    sd = {}

    def lin(prefix, o, i):
        sd[f"{prefix}.weight"] = rng.randn(o, i).astype(np.float32) * 0.02
        sd[f"{prefix}.bias"] = np.zeros(o, np.float32)

    def ln(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)

    ab = "audio_branch."
    sd[ab + "bn0.weight"] = np.ones(32, np.float32)
    sd[ab + "bn0.bias"] = np.zeros(32, np.float32)
    sd[ab + "bn0.running_mean"] = np.zeros(32, np.float32)
    sd[ab + "bn0.running_var"] = np.ones(32, np.float32)
    sd[ab + "patch_embed.proj.weight"] = rng.randn(16, 1, 4, 4).astype(
        np.float32) * 0.02
    sd[ab + "patch_embed.proj.bias"] = np.zeros(16, np.float32)
    ln(ab + "patch_embed.norm", 16)
    for i, depth in enumerate(depths):
        dim = 16 * 2 ** i
        for j in range(depth):
            base = f"{ab}layers.{i}.blocks.{j}"
            ln(f"{base}.norm1", dim)
            ln(f"{base}.norm2", dim)
            lin(f"{base}.attn.qkv", 3 * dim, dim)
            lin(f"{base}.attn.proj", dim, dim)
            sd[f"{base}.attn.relative_position_bias_table"] = \
                rng.randn(49, TINY.num_heads[i]).astype(np.float32) * 0.02
            lin(f"{base}.mlp.fc1", 4 * dim, dim)
            lin(f"{base}.mlp.fc2", dim, 4 * dim)
        if i < len(depths) - 1:
            ln(f"{ab}layers.{i}.downsample.norm", 4 * dim)
            sd[f"{ab}layers.{i}.downsample.reduction.weight"] = \
                rng.randn(2 * dim, 4 * dim).astype(np.float32) * 0.02
    ln(ab + "norm", 128)
    sd[ab + "tscam_conv.weight"] = rng.randn(527, 128, 1, 3).astype(
        np.float32) * 0.02
    sd[ab + "tscam_conv.bias"] = np.zeros(527, np.float32)
    lin("audio_projection.0", 512, 128)
    lin("audio_projection.2", 512, 512)

    converted = convert_clap_audio_encoder(sd, depths=depths)

    encoder = CLAPAudioEncoder(htsat_cfg=TINY)
    template = encoder.init(jax.random.PRNGKey(0), jnp.zeros((1, 48000)))
    t_paths = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(template["params"])[0]}
    c_paths = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(converted["params"])[0]}
    assert set(t_paths) == set(c_paths)
    for k in t_paths:
        assert tuple(t_paths[k]) == tuple(c_paths[k]), k

    out = encoder.apply(
        jax.tree_util.tree_map(jnp.asarray, converted),
        jnp.asarray(np.random.RandomState(1).randn(1, 48000).astype(
            np.float32) * 0.1))
    assert np.isfinite(np.asarray(out)).all()


def test_log_mel_np_matches_jax(rng):
    from lass_tpu.dsp.mel import log_mel_spectrogram, log_mel_spectrogram_np

    cfg = LogMelConfig()
    x = rng.randn(96000).astype(np.float32) * 0.1
    ours = log_mel_spectrogram_np(x, cfg)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(x), cfg))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)


class TestPrepareAudioFusion:
    def test_long_clip(self, rng):
        from lass_tpu.models.clap.audio_features import prepare_audio_fusion

        cfg = LogMelConfig()
        x = rng.randn(700000).astype(np.float32) * 0.1  # > 480000
        mel_fusion, longer, audio = prepare_audio_fusion(
            x, 480000, mel_cfg=cfg, rng=np.random.default_rng(0))
        chunk_frames = 480000 // cfg.hop_length + 1
        assert mel_fusion.shape == (4, chunk_frames, cfg.n_mels)
        assert longer is True or longer == True  # noqa: E712
        assert audio.shape == (480000,)

    def test_short_clip_stacks_whole_mel(self, rng):
        from lass_tpu.models.clap.audio_features import prepare_audio_fusion

        cfg = LogMelConfig()
        x = rng.randn(100000).astype(np.float32) * 0.1
        mel_fusion, longer, audio = prepare_audio_fusion(
            x, 480000, mel_cfg=cfg, rng=np.random.default_rng(0))
        chunk_frames = 480000 // cfg.hop_length + 1
        assert mel_fusion.shape == (4, chunk_frames, cfg.n_mels)
        assert not longer
        np.testing.assert_array_equal(mel_fusion[0], mel_fusion[3])


def test_query_encoder_audio_path_fusion(rng):
    """Fusion-enabled audio branch end-to-end through the facade: 32 kHz
    batch -> 48 kHz -> per-item mel-fusion stacks -> fused HTSAT embed."""
    import dataclasses

    from lass_tpu.models.clap.roberta import RobertaConfig
    from lass_tpu.models.query_encoder import CLAPQueryEncoder

    cfg = dataclasses.replace(TINY, enable_fusion=True,
                              fusion_type="aff_1d")
    enc = CLAPQueryEncoder(
        roberta_cfg=RobertaConfig(vocab_size=100, hidden_size=32,
                                  num_hidden_layers=1, num_attention_heads=4,
                                  intermediate_size=64,
                                  max_position_embeddings=80))
    enc.attach_audio_encoder(htsat_cfg=cfg, sampling_rate=32000,
                             clip_samples=48000)  # 1 s at 48 kHz
    # one short clip (repeatpad path) and one long clip (fusion path)
    short = rng.randn(32000).astype(np.float32) * 0.1
    audio = np.stack([short, rng.randn(32000).astype(np.float32) * 0.1])
    out = np.asarray(enc.get_query_embed("audio", audio=jnp.asarray(audio)))
    assert out.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
