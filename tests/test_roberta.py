"""Parity: lass_tpu RobertaModel vs torch transformers RobertaModel
(random weights, locally-constructed config — no downloads)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lass_tpu.models.clap.roberta import RobertaConfig, RobertaModel


SMALL = RobertaConfig(
    vocab_size=99, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=40, pad_token_id=1)


def torch_roberta(cfg: RobertaConfig):
    import torch
    from transformers import RobertaConfig as HFConfig
    from transformers import RobertaModel as HFModel
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps, pad_token_id=cfg.pad_token_id,
        hidden_act="gelu", attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    model = HFModel(hf_cfg)
    model.eval()
    return model


def convert_hf_state(model, cfg: RobertaConfig):
    """HF torch state_dict -> lass_tpu RobertaModel params (the same mapping
    the checkpoint converter uses — see lass_tpu/convert/torch_to_jax.py)."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    def lin(prefix):
        return {"kernel": jnp.asarray(sd[prefix + ".weight"].T.copy()),
                "bias": jnp.asarray(sd[prefix + ".bias"].copy())}

    def ln(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"].copy()),
                "bias": jnp.asarray(sd[prefix + ".bias"].copy())}

    params = {
        "word_embeddings": {"embedding": jnp.asarray(
            sd["embeddings.word_embeddings.weight"].copy())},
        "position_embeddings": {"embedding": jnp.asarray(
            sd["embeddings.position_embeddings.weight"].copy())},
        "token_type_embeddings": {"embedding": jnp.asarray(
            sd["embeddings.token_type_embeddings.weight"].copy())},
        "embeddings_ln": ln("embeddings.LayerNorm"),
        "pooler": lin("pooler.dense"),
    }
    for i in range(cfg.num_hidden_layers):
        e = f"encoder.layer.{i}"
        qkv_w = np.concatenate([
            sd[f"{e}.attention.self.query.weight"],
            sd[f"{e}.attention.self.key.weight"],
            sd[f"{e}.attention.self.value.weight"]], axis=0)
        qkv_b = np.concatenate([
            sd[f"{e}.attention.self.query.bias"],
            sd[f"{e}.attention.self.key.bias"],
            sd[f"{e}.attention.self.value.bias"]], axis=0)
        params[f"layer_{i}"] = {
            "attention": {
                "qkv": {"kernel": jnp.asarray(qkv_w.T.copy()),
                        "bias": jnp.asarray(qkv_b.copy())},
                "out": lin(f"{e}.attention.output.dense"),
            },
            "attention_ln": ln(f"{e}.attention.output.LayerNorm"),
            "intermediate": lin(f"{e}.intermediate.dense"),
            "output": lin(f"{e}.output.dense"),
            "output_ln": ln(f"{e}.output.LayerNorm"),
        }
    return params


@pytest.fixture(scope="module")
def models():
    hf = torch_roberta(SMALL)
    params = convert_hf_state(hf, SMALL)
    return hf, RobertaModel(SMALL), params


def test_roberta_matches_hf(models, rng):
    import torch
    hf, mine, params = models
    ids = rng.randint(3, SMALL.vocab_size, size=(2, 11)).astype(np.int32)
    ids[:, 0] = 0  # <s>
    mask = np.ones_like(ids)
    mask[1, 8:] = 0
    ids[1, 8:] = SMALL.pad_token_id

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(mask.astype(np.int64)))
    hidden, pooled = mine.apply({"params": params}, jnp.asarray(ids),
                                jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(hidden), ref.last_hidden_state.numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pooled), ref.pooler_output.numpy(), atol=2e-5)


def test_padding_length_invariance(models, rng):
    """Pooled output must be identical whether a caption is padded to 16 or
    to 512 tokens — this is what lets us drop the reference's fixed-512
    padding (clap_encoder.py:108-116) at inference."""
    _, mine, params = models
    ids = rng.randint(3, SMALL.vocab_size, size=(1, 9)).astype(np.int32)
    ids[0, 0] = 0

    def run(pad_to):
        p_ids = np.full((1, pad_to), SMALL.pad_token_id, np.int32)
        p_ids[:, :9] = ids
        p_mask = np.zeros((1, pad_to), np.int32)
        p_mask[:, :9] = 1
        _, pooled = mine.apply({"params": params}, jnp.asarray(p_ids),
                               jnp.asarray(p_mask))
        return np.asarray(pooled)

    np.testing.assert_allclose(run(16), run(32), atol=1e-6)
