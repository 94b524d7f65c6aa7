"""CLAP contrastive pretraining on a sharded 8-device mesh (the implicit
all-gather path) + loss semantics."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lass_tpu.dsp.mel import LogMelConfig
from lass_tpu.models.clap.htsat import HTSATConfig
from lass_tpu.models.clap.model import CLAPAudioEncoder, CLAPTextEncoder
from lass_tpu.models.clap.roberta import RobertaConfig
from lass_tpu.tasks.clap_pretrain import (
    CLAPPretrainTask, MAX_LOGIT_SCALE, clip_loss)
from lass_tpu.train.optim import build_optimizer

TINY_HTSAT = HTSATConfig(
    spec_size=128, embed_dim=16, depths=(1, 1, 1, 1),
    num_heads=(2, 2, 2, 2), window_size=4,
    mel=LogMelConfig(sample_rate=48000, n_fft=256, hop_length=480,
                     n_mels=32))
TINY_ROBERTA = RobertaConfig(vocab_size=120, hidden_size=32,
                             num_hidden_layers=1, num_attention_heads=4,
                             intermediate_size=64,
                             max_position_embeddings=40)


def test_clip_loss_prefers_aligned_embeddings(rng):
    d = 16
    aligned = jnp.asarray(np.eye(4, d, dtype=np.float32))
    loss_aligned = clip_loss(aligned, aligned, jnp.asarray(2.0),
                             jnp.asarray(2.0))
    shuffled = jnp.asarray(np.eye(4, d, dtype=np.float32)[::-1].copy())
    loss_shuffled = clip_loss(aligned, shuffled, jnp.asarray(2.0),
                              jnp.asarray(2.0))
    assert float(loss_aligned) < float(loss_shuffled)


@pytest.mark.parametrize("sharded", [False, True])
def test_pretrain_step(sharded, rng):
    task = CLAPPretrainTask(
        audio_encoder=CLAPAudioEncoder(htsat_cfg=TINY_HTSAT),
        text_encoder=CLAPTextEncoder(TINY_ROBERTA),
        optimizer=build_optimizer("AdamW", 1e-4, "constant_warm_up", 0, 1),
    )
    b, wav_len, seq = 8, 24000, 12
    audio = jnp.asarray(rng.randn(b, wav_len).astype(np.float32) * 0.05)
    ids = jnp.asarray(rng.randint(3, 100, size=(b, seq)).astype(np.int32))
    mask = jnp.ones_like(ids)
    state = task.init_state(jax.random.PRNGKey(0), audio[:1], ids[:1])
    batch = {"waveform": audio, "input_ids": ids, "attention_mask": mask}

    if sharded:
        from lass_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

        mesh = make_mesh(jax.devices()[:8])
        bs, rep = batch_sharding(mesh), replicated(mesh)
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, bs), batch)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state)
        with mesh:
            new_state, metrics = jax.jit(task.train_step)(state, batch)
    else:
        new_state, metrics = jax.jit(task.train_step)(state, batch)

    assert np.isfinite(float(metrics["contrastive_loss"]))
    assert int(new_state.step) == 1
    # logit scales trained and clamped
    assert float(new_state.params["logit_scale_a"]) <= MAX_LOGIT_SCALE
    assert float(new_state.params["logit_scale_a"]) != float(
        state.params["logit_scale_a"])
