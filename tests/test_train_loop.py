"""End-to-end smoke: datafiles -> loader -> query embed -> jitted sharded
train step -> checkpoint + metrics (BASELINE config 5 slice, tiny shapes)."""
import json
import os

import numpy as np
import pytest
import jax

from lass_tpu.audio.io import write_wav
from lass_tpu.models.clap.roberta import RobertaConfig
from lass_tpu.models.query_encoder import CLAPQueryEncoder


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("ws")
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    entries = []
    for i in range(10):
        path = str(wav_dir / f"clip_{i}.wav")
        # 1.2 s at 16 kHz, one longer, one stereo, one at 8 kHz
        if i == 7:
            write_wav(path, rng.randn(2, 20000).astype(np.float32) * 0.1,
                      16000)
        elif i == 8:
            write_wav(path, rng.randn(1, 9000).astype(np.float32) * 0.1, 8000)
        else:
            write_wav(path, rng.randn(1, 19200).astype(np.float32) * 0.1,
                      16000)
        entries.append({"wav": path, "caption": f"sound number {i}"})
    # one corrupt file exercising the safe-collate path
    bad = str(wav_dir / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"junk")
    entries.append({"wav": bad, "caption": "corrupt"})

    datafile = root / "data.json"
    datafile.write_text(json.dumps({"data": entries}))

    config = root / "config.yaml"
    config.write_text(f"""
task_name: AudioSep
data:
    datafiles:
        - '{datafile}'
    sampling_rate: 16000
    segment_seconds: 1
    loudness_norm:
        lower_db: -10
        higher_db: 10
    max_mix_num: 2
    stft_hop_length: 160
    stft_window: 'hann'
    stft_center: true
    stft_pad_mode: 'reflect'
    stft_win_lengths: [256, 512, 2048]
model:
    query_net: CLAP
    condition_size: 512
    model_type: ResUNet30
    input_channels: 1
    output_channels: 1
    resume_checkpoint: ""
    use_text_ratio: 1.0
    compute_dtype: float32
train:
    optimizer:
        optimizer_type: AdamW
        learning_rate: 1e-3
        warm_up_steps: 10000
        reduce_lr_steps: 1000000
        lr_lambda_type: constant_warm_up
    num_nodes: 1
    num_workers: 2
    loss_type: l1_wav
    sync_batchnorm: True
    batch_size_per_device: 1
    steps_per_epoch: 10000
    evaluate_step_frequency: 10000
    save_step_frequency: 2
    early_stop_steps: 10000001
    random_seed: 1234
""")
    return root, config


def small_query_encoder():
    cfg = RobertaConfig(vocab_size=200, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=80)
    return CLAPQueryEncoder(roberta_cfg=cfg)


def test_trainer_end_to_end(workspace):
    from lass_tpu.train.loop import Trainer

    root, config = workspace
    trainer = Trainer(
        config_yaml=str(config),
        workspace=str(root / "out"),
        query_encoder=small_query_encoder(),
    )
    state = trainer.fit(max_steps=3)
    assert int(state.step) == 3

    # checkpoints at step 1 (reference cadence) and step 2 (freq=2)
    steps = sorted(int(p) for p in os.listdir(trainer.checkpoints_dir)
                   if p.isdigit())
    assert 1 in steps and 2 in steps

    # metrics jsonl written
    metrics_path = os.path.join(trainer.tf_logs_dir, "metrics.jsonl")
    lines = [json.loads(l) for l in open(metrics_path)]
    assert any(l["step"] == 1 for l in lines)
    assert all(np.isfinite(l["train_loss"]) for l in lines)


def test_trainer_resume(workspace):
    from lass_tpu.train.loop import Trainer

    root, config = workspace
    trainer = Trainer(
        config_yaml=str(config),
        workspace=str(root / "out"),
        resume_checkpoint_path=os.path.join(
            str(root / "out"), "checkpoints", "train",
            "config,devices=8"),
        query_encoder=small_query_encoder(),
    )
    assert int(trainer.state.step) >= 1


def test_trainer_hybrid_embeds_mixed_segments(workspace):
    """Hybrid conditioning must embed the MIXED, declip-rescaled segments
    (reference audiosep.py:77-88 passes segments AFTER the mixer), not the
    raw pre-mix waveforms."""
    from lass_tpu.train.loop import Trainer

    root, config = workspace
    hybrid_cfg = root / "config_hybrid.yaml"
    hybrid_cfg.write_text(config.read_text().replace(
        "use_text_ratio: 1.0", "use_text_ratio: 0.0"))

    class RecordingEncoder:
        encoder_type = "CLAP"

        def __init__(self):
            self.received_audio = None

        def get_query_embed(self, modality, audio=None, text=None,
                            use_text_ratio=0.5, **kw):
            assert modality == "hybird"
            assert audio is not None  # ratio 0.0 -> always audio branch
            self.received_audio = np.asarray(audio)
            rng = np.random.RandomState(0)
            e = rng.randn(self.received_audio.shape[0], 512)
            return jax.numpy.asarray(
                e / np.linalg.norm(e, axis=-1, keepdims=True))

    encoder = RecordingEncoder()
    trainer = Trainer(
        config_yaml=str(hybrid_cfg),
        workspace=str(root / "out_hybrid"),
        query_encoder=encoder,
    )

    rec = {}
    orig_mix = trainer._mix_fn

    def spy_mix(waveform, rng, step):
        mixtures, segments = orig_mix(waveform, rng, step)
        rec["waveform"] = np.asarray(waveform)
        rec["segments"] = np.asarray(segments)
        return mixtures, segments

    trainer._mix_fn = spy_mix
    state = trainer.fit(max_steps=1)
    assert int(state.step) == 1

    got = encoder.received_audio
    assert got is not None and got.shape == rec["segments"][:, 0].shape
    np.testing.assert_allclose(got, rec["segments"][:, 0], atol=1e-6)
    # and they differ from the raw pre-mix waveforms (declip/energy scaling)
    assert not np.allclose(got, rec["waveform"][:, 0], atol=1e-6)


def test_resume_roundtrip_bit_consistent(tmp_path):
    """Save at step N, restore into a fresh state template, continue on the
    SAME batches: step counter, optimizer state, and loss trajectory must
    be identical to an uninterrupted run (VERDICT r1 item 10)."""
    import jax.numpy as jnp

    from lass_tpu.data.mixer import SegmentMixer
    from lass_tpu.models.resunet import ResUNet30
    from lass_tpu.tasks.audiosep import AudioSepTask
    from lass_tpu.train.checkpoint import CheckpointManager
    from lass_tpu.train.optim import build_optimizer

    def make_task():
        return AudioSepTask(
            model=ResUNet30(compute_dtype=jnp.float32),
            mixer=SegmentMixer(2, -10, 10),
            optimizer=build_optimizer("AdamW", 1e-3, "constant_warm_up",
                                      100, 1000),
        )

    rng = np.random.RandomState(7)
    batches = [
        {"waveform": jnp.asarray(rng.randn(2, 1, 16000) * 0.1,
                                 jnp.float32),
         "condition": jnp.asarray(rng.randn(2, 512) * 0.3, jnp.float32)}
        for _ in range(4)
    ]
    key = jax.random.PRNGKey(3)

    task = make_task()
    step_fn = jax.jit(task.train_step)

    # uninterrupted run: 4 steps
    state = task.init_state(jax.random.PRNGKey(0), 16000)
    losses_full = []
    for b in batches:
        state, metrics = step_fn(state, b, key)
        losses_full.append(float(metrics["train_loss"]))
    final_full = state

    # interrupted run: 2 steps, save, restore into a FRESH template, 2 more
    state = task.init_state(jax.random.PRNGKey(0), 16000)
    losses_a = []
    for b in batches[:2]:
        state, metrics = step_fn(state, b, key)
        losses_a.append(float(metrics["train_loss"]))
    ckpt = CheckpointManager(str(tmp_path / "ckpt"), save_step_frequency=2)
    ckpt.save(2, state)
    ckpt.wait()

    task2 = make_task()
    template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        task2.init_state(jax.random.PRNGKey(99), 16000))
    restored = CheckpointManager(str(tmp_path / "ckpt")).restore(template)
    assert int(restored.step) == 2
    step_fn2 = jax.jit(task2.train_step)
    losses_b = []
    for b in batches[2:]:
        restored, metrics = step_fn2(restored, b, key)
        losses_b.append(float(metrics["train_loss"]))

    np.testing.assert_array_equal(losses_a + losses_b, losses_full)
    assert int(restored.step) == int(final_full.step) == 4
    for got, want in zip(jax.tree_util.tree_leaves(restored),
                         jax.tree_util.tree_leaves(final_full)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
