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
