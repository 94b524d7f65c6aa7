"""Converter tests: synthetic reference-style torch state dicts -> lass_tpu
pytrees (key mapping, film packing, shape validation)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lass_tpu.convert.torch_to_jax import (
    convert_clap_text_encoder, convert_resunet30)
from lass_tpu.models.film import resunet30_film_spec
from lass_tpu.models.resunet import ResUNet30


def synth_resunet_state_dict(rng):
    """Reference AudioSep checkpoint key set (module tree of
    resunet.py:267-429 + FiLM '->'-mangled Linears :31,51-57)."""
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = (rng.rand(c) + 0.5).astype(np.float32)

    def conv(prefix, o, i, k=3, bias=False):
        sd[f"{prefix}.weight"] = (rng.randn(o, i, k, k) * 0.05
                                  ).astype(np.float32)
        if bias:
            sd[f"{prefix}.bias"] = rng.randn(o).astype(np.float32)

    def block(prefix, cin, cout):
        bn(f"{prefix}.bn1", cin)
        bn(f"{prefix}.bn2", cout)
        conv(f"{prefix}.conv1", cout, cin)
        conv(f"{prefix}.conv2", cout, cout)
        if cin != cout:
            conv(f"{prefix}.shortcut", cout, cin, k=1, bias=True)

    enc = [("encoder_block1", 32, 32), ("encoder_block2", 32, 64),
           ("encoder_block3", 64, 128), ("encoder_block4", 128, 256),
           ("encoder_block5", 256, 384), ("encoder_block6", 384, 384),
           ("conv_block7a", 384, 384)]
    dec = [("decoder_block1", 384, 384), ("decoder_block2", 384, 384),
           ("decoder_block3", 384, 256), ("decoder_block4", 256, 128),
           ("decoder_block5", 128, 64), ("decoder_block6", 64, 32)]

    bn("ss_model.base.bn0", 513)
    conv("ss_model.base.pre_conv", 32, 1, k=1, bias=True)
    conv("ss_model.base.after_conv", 3, 32, k=1, bias=True)
    for name, cin, cout in enc:
        block(f"ss_model.base.{name}.conv_block1", cin, cout)
    for name, cin, cout in dec:
        bn(f"ss_model.base.{name}.bn1", cin)
        bn(f"ss_model.base.{name}.bn2", cin)  # dead in reference forward
        kh, kw = (1, 2) if name == "decoder_block1" else (2, 2)
        sd[f"ss_model.base.{name}.conv1.weight"] = (
            rng.randn(cin, cout, kh, kw) * 0.05).astype(np.float32)
        block(f"ss_model.base.{name}.conv_block2", cout * 2, cout)

    for path, feat, _used in resunet30_film_spec():
        key = "ss_model.film." + "->".join(path)
        sd[f"{key}.weight"] = (rng.randn(feat, 512) * 0.02).astype(np.float32)
        sd[f"{key}.bias"] = rng.randn(feat).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def converted(rng=np.random.RandomState(0)):
    sd = synth_resunet_state_dict(rng)
    return sd, convert_resunet30(sd, resunet30_film_spec())


def test_resunet_conversion_applies(converted):
    sd, variables = converted
    model = ResUNet30()
    x = {
        "mixture": jnp.asarray(
            np.random.RandomState(1).randn(1, 1, 16000).astype(np.float32)
            * 0.1),
        "condition": jnp.asarray(
            np.random.RandomState(2).randn(1, 512).astype(np.float32)),
    }
    # structure must match the model's own init exactly
    template = model.init(jax.random.PRNGKey(0), x, train=False)
    t_paths = set(jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(
                      template["params"])[0])
    c_paths = set(jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(
                      variables["params"])[0])
    assert t_paths == c_paths
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(template["params"])[0],
            jax.tree_util.tree_flatten_with_path(variables["params"])[0]):
        assert a.shape == np.asarray(b).shape, (p1, a.shape, b.shape)

    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, variables["params"]),
         "batch_stats": jax.tree_util.tree_map(
             jnp.asarray, variables["batch_stats"])},
        x, train=False)
    assert np.isfinite(np.asarray(out["waveform"])).all()


def test_film_packing_order(converted):
    """A specific reference FiLM Linear must land at its spec offset."""
    sd, variables = converted
    spec = resunet30_film_spec()
    offset = 0
    for path, feat, _ in spec:
        if path == ("encoder_block3", "conv_block1", "beta2"):
            key = "ss_model.film." + "->".join(path)
            np.testing.assert_array_equal(
                variables["params"]["film"]["kernel"][:, offset:offset + feat],
                sd[f"{key}.weight"].T)
            np.testing.assert_array_equal(
                variables["params"]["film"]["bias"][offset:offset + feat],
                sd[f"{key}.bias"])
            return
        offset += feat
    raise AssertionError("spec entry not found")


def test_torch_ckpt_file_roundtrip(tmp_path):
    """A Lightning-style .ckpt file (state_dict under 'state_dict') loads
    through load_inference_variables with shape validation."""
    import torch

    from lass_tpu.convert.checkpoint_io import load_inference_variables

    rng = np.random.RandomState(3)
    sd = {k: torch.from_numpy(v)
          for k, v in synth_resunet_state_dict(rng).items()}
    path = str(tmp_path / "model.ckpt")
    torch.save({"state_dict": sd, "global_step": 12345}, path)

    model = ResUNet30()
    variables = load_inference_variables(model, path, 16000)
    out = model.apply(
        variables,
        {"mixture": jnp.zeros((1, 1, 16000)),
         "condition": jnp.zeros((1, 512))}, train=False)
    assert np.isfinite(np.asarray(out["waveform"])).all()


def test_clap_text_conversion():
    import torch
    from transformers import RobertaConfig as HFConfig
    from transformers import RobertaModel as HFModel

    torch.manual_seed(0)
    hf = HFModel(HFConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                          num_attention_heads=2, intermediate_size=32,
                          max_position_embeddings=20, type_vocab_size=1,
                          pad_token_id=1))
    sd = {"text_branch." + k: v for k, v in hf.state_dict().items()}
    sd["text_projection.0.weight"] = torch.randn(512, 16)
    sd["text_projection.0.bias"] = torch.randn(512)
    sd["text_projection.2.weight"] = torch.randn(512, 512)
    sd["text_projection.2.bias"] = torch.randn(512)

    params = convert_clap_text_encoder(sd, num_layers=1)
    from lass_tpu.models.clap.model import CLAPTextEncoder
    from lass_tpu.models.clap.roberta import RobertaConfig

    enc = CLAPTextEncoder(RobertaConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=20))
    ids = jnp.asarray([[0, 5, 6, 2]], jnp.int32)
    out = enc.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        ids, jnp.ones_like(ids))
    assert out.shape == (1, 512)
    np.testing.assert_allclose(float(jnp.linalg.norm(out)), 1.0, atol=1e-5)


def test_rekey_pretrained_audio_layouts():
    """factory.py:165-231 key-remapping parity for the four recognized
    pretrained-audio checkpoint layouts."""
    from lass_tpu.convert.torch_to_jax import rekey_pretrained_audio

    w = np.zeros(1, np.float32)
    # PANN official: ckpt['model'], front-end keys stay unprefixed
    ckpt = {"model": {"conv_block1.conv1.weight": w,
                      "spectrogram_extractor.stft.conv_real.weight": w}}
    out = rekey_pretrained_audio(ckpt, "PANN-14", "/x/Cnn14_mAP=0.431.pth")
    assert "audio_branch.conv_block1.conv1.weight" in out
    assert "spectrogram_extractor.stft.conv_real.weight" in out

    # PANN via HTSAT codebase: sed_model. -> audio_branch.
    ckpt = {"state_dict": {"sed_model.conv_block1.conv1.weight": w,
                           "other.thing": w}}
    out = rekey_pretrained_audio(ckpt, "PANN-14", "/x/PANN_ft.ckpt")
    assert "audio_branch.conv_block1.conv1.weight" in out
    assert "other.thing" in out

    # HTSAT official: sed_model. -> audio_branch., front-end skipped
    ckpt = {"state_dict": {
        "sed_model.patch_embed.proj.weight": w,
        "sed_model.spectrogram_extractor.stft.conv_real.weight": w}}
    out = rekey_pretrained_audio(ckpt, "HTSAT-base",
                                 "/x/HTSAT_AudioSet_Saved_1.ckpt")
    assert "audio_branch.patch_embed.proj.weight" in out
    assert not any(k.startswith("audio_branch.spectrogram") for k in out)

    # linear-probe: as-is
    ckpt = {"audio_branch.norm.weight": w}
    out = rekey_pretrained_audio(ckpt, "HTSAT-base", "/x/finetuned_x.pt")
    assert out == ckpt

    with pytest.raises(ValueError):
        rekey_pretrained_audio({}, "HTSAT-base", "/x/mystery.pt")


def test_convert_pretrained_audio_pann_end_to_end(rng):
    """Official-PANN-layout checkpoint -> runnable Cnn14 variables."""
    import jax.numpy as jnp_

    from lass_tpu.convert.torch_to_jax import convert_pretrained_audio
    from lass_tpu.dsp.mel import LogMelConfig
    from lass_tpu.models.clap.pann import PANN, PANNConfig

    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    bn("bn0", 64)
    chans = [64, 128, 256, 512, 1024, 2048]
    cin = 1
    for i, c in enumerate(chans):
        sd[f"conv_block{i+1}.conv1.weight"] = (
            rng.randn(c, cin, 3, 3) * 0.02).astype(np.float32)
        sd[f"conv_block{i+1}.conv2.weight"] = (
            rng.randn(c, c, 3, 3) * 0.02).astype(np.float32)
        bn(f"conv_block{i+1}.bn1", c)
        bn(f"conv_block{i+1}.bn2", c)
        cin = c
    for name, o, i in [("fc1", 2048, 2048), ("fc_audioset", 527, 2048)]:
        sd[f"{name}.weight"] = (rng.randn(o, i) * 0.02).astype(np.float32)
        sd[f"{name}.bias"] = np.zeros(o, np.float32)
    sd["spectrogram_extractor.stft.conv_real.weight"] = np.zeros(
        1, np.float32)

    variables = convert_pretrained_audio({"model": sd}, "PANN-14",
                                         "/ckpt/Cnn14_mAP=0.431.pth")
    cfg = PANNConfig(mel=LogMelConfig(sample_rate=16000, n_fft=256,
                                      hop_length=160, n_mels=64))
    model = PANN(cfg)
    wave = jnp_.asarray(rng.randn(1, 16000).astype(np.float32) * 0.1)
    out = model.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]},
                      wave, train=False)
    assert out["embedding"].shape == (1, 2048)
    assert np.isfinite(np.asarray(out["embedding"])).all()
