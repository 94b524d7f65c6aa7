"""Parity: lass_tpu BertModel / BartEncoderModel (+ the full CLAP
bert/bart text-encoder paths) vs torch transformers with random weights —
the last reference text branches (open_clip/model.py:475-549, 644-676)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lass_tpu.models.clap.bert import (
    BartConfig, BartEncoderModel, BertConfig, BertModel)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

BERT_SMALL = BertConfig(
    vocab_size=99, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=40)
BART_SMALL = BartConfig(
    vocab_size=99, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=40)


def hf_bert(cfg: BertConfig):
    hf_cfg = transformers.BertConfig(
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
    model = transformers.BertModel(hf_cfg)
    model.eval()
    return model


def hf_bart(cfg: BartConfig):
    hf_cfg = transformers.BartConfig(
        vocab_size=cfg.vocab_size, d_model=cfg.hidden_size,
        encoder_layers=cfg.num_hidden_layers,
        decoder_layers=1,
        encoder_attention_heads=cfg.num_attention_heads,
        decoder_attention_heads=cfg.num_attention_heads,
        encoder_ffn_dim=cfg.intermediate_size,
        decoder_ffn_dim=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        pad_token_id=cfg.pad_token_id, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
        activation_function="gelu", scale_embedding=False)
    torch.manual_seed(1)
    model = transformers.BartModel(hf_cfg)
    model.eval()
    return model


def _ids_mask(rng, cfg, b=3, s=9):
    ids = rng.randint(4, cfg.vocab_size - 1, size=(b, s))
    mask = np.ones((b, s), np.int64)
    mask[1, 6:] = 0
    ids[1, 6:] = cfg.pad_token_id
    return ids.astype(np.int64), mask


def test_bert_parity(rng):
    from lass_tpu.convert.torch_to_jax import convert_hf_bert_state

    model = hf_bert(BERT_SMALL)
    params = convert_hf_bert_state(model.state_dict(),
                                   BERT_SMALL.num_hidden_layers)
    ids, mask = _ids_mask(rng, BERT_SMALL)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask),
                    token_type_ids=torch.zeros_like(torch.tensor(ids)))
    hidden, pooled = BertModel(BERT_SMALL).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(ids), jnp.asarray(mask))
    # padded positions diverge (HF keeps them; masked out downstream) —
    # compare valid positions + the pooled output the CLAP branch uses
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(hidden)[valid],
        ref.last_hidden_state.numpy()[valid], atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooler_output.numpy(), atol=2e-5)


def test_bart_encoder_parity(rng):
    from lass_tpu.convert.torch_to_jax import convert_hf_bart_encoder_state

    model = hf_bart(BART_SMALL)
    params = convert_hf_bart_encoder_state(model.state_dict(),
                                           BART_SMALL.num_hidden_layers)
    ids, mask = _ids_mask(rng, BART_SMALL)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)
                    ).encoder_last_hidden_state.numpy()
    hidden = BartEncoderModel(BART_SMALL).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(ids), jnp.asarray(mask))
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(hidden)[valid], ref[valid],
                               atol=2e-5)


@pytest.mark.parametrize("model_type", ["bert", "bart"])
def test_clap_text_encoder_bert_bart(model_type, rng):
    """Full branch: text_branch + text_projection MLP + normalize vs the
    reference composition (encode_text 'bert'/'bart' + get_text_embedding
    normalize, model.py:644-676, 732-752)."""
    from lass_tpu.convert.torch_to_jax import convert_clap_text_encoder
    from lass_tpu.models.clap.model import (
        CLAPBartTextEncoder, CLAPBertTextEncoder)

    cfg = BERT_SMALL if model_type == "bert" else BART_SMALL
    branch = hf_bert(cfg) if model_type == "bert" else hf_bart(cfg)
    torch.manual_seed(2)
    proj = torch.nn.Sequential(
        torch.nn.Linear(cfg.hidden_size, 16), torch.nn.ReLU(),
        torch.nn.Linear(16, 16))
    proj.eval()

    sd = {f"text_branch.{k}": v for k, v in branch.state_dict().items()}
    sd.update({f"text_projection.{k}": v for k, v in
               proj.state_dict().items()})
    params = convert_clap_text_encoder(sd, cfg.num_hidden_layers,
                                       model_type=model_type)

    ids, mask = _ids_mask(rng, cfg)
    with torch.no_grad():
        if model_type == "bert":
            x = branch(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask),
                       token_type_ids=torch.zeros_like(torch.tensor(ids))
                       ).pooler_output
        else:
            x = branch(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask)
                       ).encoder_last_hidden_state.mean(axis=1)
        x = proj(x)
        ref = (x / x.norm(dim=-1, keepdim=True)).numpy()

    enc_cls = (CLAPBertTextEncoder if model_type == "bert"
               else CLAPBartTextEncoder)
    kwargs = ({"bert_cfg": cfg} if model_type == "bert"
              else {"bart_cfg": cfg})
    got = enc_cls(joint_embed_dim=16, **kwargs).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(ids), jnp.asarray(mask))
    if model_type == "bert":
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)
    else:
        # the reference's BART mean includes padded positions, whose
        # hidden states HF computes from pad embeddings; our padded rows
        # match HF's because the pad token ids are identical
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(got), axis=-1), 1.0, atol=1e-5)
